#!/usr/bin/env python3
"""Re-record bench_budgets.json from the latest quiet bench_queries.json
(the max(0.5 s, 2x recorded) rule). Prints queries whose budget moved by
more than 1.5x in either direction so a real regression can't slip
through a silent re-record."""
import json

qs = json.load(open("bench_queries.json"))["queries"]
old = json.load(open("bench_budgets.json"))["budgets"]
new = {k: max(0.5, round(2 * v, 2)) for k, v in qs.items()}
for k in sorted(set(old) | set(new)):
    a, b = old.get(k), new.get(k)
    if a is None:
        print(f"NEW    {k}: budget {b}")
    elif b is None:
        print(f"GONE   {k} (budget {a})")
    elif b > 1.5 * a or a > 1.5 * b:
        print(f"MOVED  {k}: {a} -> {b}")
json.dump({"budgets": dict(sorted(new.items()))}, open("bench_budgets.json", "w"), indent=1)
print(f"recorded {len(new)} budgets, total quiet run {sum(qs.values()):.1f}s")
