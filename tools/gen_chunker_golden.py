#!/usr/bin/env python3
"""Regenerate src/test/resources/chunker_golden.json by EXECUTING the
reference's chunk_code (log-vector index.py:298-319) directly — the
function source is extracted with ast from /root/reference/index.py and
exec'd in isolation (no re-port), so the golden fixture is anchored to
the true reference algorithm, not to our own implementation."""
import ast, json, random, sys

REF = "/root/reference/index.py"
OUT = "src/test/resources/chunker_golden.json"

src = open(REF, encoding="utf-8").read()
tree = ast.parse(src)
fn = next(n for n in ast.walk(tree) if isinstance(n, ast.FunctionDef)
          and n.name == "chunk_code")
ns = {"List": list, "DEFAULT_CHUNK_SIZE": 2000}
# typing.List annotation appears in the signature/body
import typing
ns["List"] = typing.List
exec(compile(ast.Module(body=[fn], type_ignores=[]), REF, "exec"), ns)
chunk_code = ns["chunk_code"]

rnd = random.Random(42)

def random_content():
    n = rnd.randint(0, 30)
    lines = []
    for _ in range(n):
        k = rnd.randint(0, 3)
        if k == 0:
            lines.append("")
        elif k == 1:
            lines.append("".join(rnd.choices(
                "abcdefghijklmnopqrstuvwxyz0123456789", k=rnd.randint(0, 29))))
        elif k == 2:
            lines.append("".join(rnd.choices(
                "abcdefghijklmnopqrstuvwxyz0123456789", k=150 + rnd.randint(0, 99))))
        else:
            lines.append(" " * rnd.randint(0, 4))
    return "\n".join(lines)

cases = []
# hand-picked boundary cases (incl. exact-fit chunk boundaries, the
# divergence class the round-1 fixture missed)
hand = [
    ("", 100), ("hello", 100), ("abcd\nefgh\nijkl", 10),
    ("abcd\nefgh\nijkl", 9), ("abcd\nefgh\nijkl", 11),
    ("a\nb\n", 100), ("a\nb\n", 2), ("a\nb\n", 3), ("a\nb\n", 4),
    ("x" * 500, 100), ("short\n" + "x" * 500 + "\nend", 100),
    ("x" * 10 + "\n" + "y" * 10, 11),   # exact-fit first line
    ("x" * 9 + "\n" + "y" * 10, 10),    # first line lands exactly on size
    ("\n\n\n", 1), ("\n\n\n", 2), ("\n", 1),
    ("ab\ncd\nef\ngh", 6),              # repeated exact-fit chunks
    ("ab\ncd\nef\ngh", 5),
]
for content, size in hand:
    cases.append({"content": content, "chunk_size": size,
                  "chunks": chunk_code(content, size)})
while len(cases) < 204:
    content = random_content()
    size = 5 + rnd.randint(0, 119)
    cases.append({"content": content, "chunk_size": size,
                  "chunks": chunk_code(content, size)})

json.dump(cases, open(OUT, "w", encoding="utf-8"), ensure_ascii=False)
print(f"wrote {len(cases)} cases to {OUT}")
