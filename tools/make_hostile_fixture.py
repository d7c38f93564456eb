#!/usr/bin/env python3
"""Build the hostile documents fixture (dev-side, driver-style python).

Copies an sf fixture dir and replaces `documents.parquet` with ~64
crafted docs that exercise what the word-soup fixture can't:

  * whitespace hostility: leading/trailing/double spaces, an empty
    doc, a whitespace-only doc (split-parity: `split(text, ' ', -1)`
    vs DuckDB string_split must bit-match on all of them);
  * a shared 25-word passage planted in docs with doc_id % 4 == 0 so
    cross-doc dedup/decontam ops have real multi-doc signal, and in
    doc 50 (the % 50 == 0 benchmark convention) so decontamination
    sees a contaminated benchmark;
  * %10 arrival-split signal: batch docs (doc_id % 10 == 0) that
    copy corpus passages, so the incremental scrubs cut something;
  * long INTRA-doc repeats (round 13): tails replaying a 10-word
    head (coarse 8/12 grain: signal without a cut), a >= 14-word
    head (coarse cut), and a scattered 4-word phrase repeat (fine
    3/4 grain cuts, coarse is structurally blind) — so the two
    repetition grains provably disagree on this fixture;
  * media hostility (round 14, docs 15-29 odd): payloads whose
    TEXT bytes start with real codec magic (GIF89a/GIF87a/BM +
    soup) — the JDK readers recognize the magic but throw on the
    garbage body, so the engine falls back to the stub codec and
    the media_meta oracle's stub-path assumption HOLDS (pinned by
    MultimodalSpec; a fully-VALID pure-ASCII GIF would take the
    real path and is therefore pinned spec-side, never planted
    here); frame-boundary byte lengths (exactly 64 = 1 frame,
    exactly 128 = 2 frames, 200 > 3*64 so the 3-frame cap binds);
    an exact byte-duplicate pair (every frame shared — media
    dedup's strongest signal) and a shared-64-byte-head pair with
    divergent tails (exactly one shared frame).

Round 15 extends the hostility to the last two verbatim-copied
tables:

  * `events.parquet` is REPLACED by a crafted set that lives
    entirely in a ~2.5-day window AROUND THE UNIX EPOCH (so the
    hourly_dense spine stays bounded): epoch-0 rows (ts exactly
    1970-01-01T00:00:00.000000), pre-epoch NEGATIVE-microsecond rows
    (date_trunc/epoch flooring on negatives), identical-timestamp
    tie clusters (window order must tie-break on event_id),
    EXACT 30-minute gaps (q11's strict `>` and q26's `>=` session
    semantics provably disagree on them), band-edge clicks exactly
    at `purchase_ts - 1h` and at `purchase_ts` for the banded range
    join (including a purchase at a negative bucket boundary, where
    truncating vs flooring `div` would mis-bucket), a funnel of
    same-timestamp stages (strict `>` stage gates), props JSON edge
    shapes ({}, missing key, null k, negative k, max-BIGINT k,
    multi-key), and one mega-user for skew_report.
  * `embeddings.parquet` keeps the original 500 rows and APPENDS
    hostile vectors: an all-zero vector (quirk Q4's degenerate
    cosine — engines must agree on exclusion), an exact float dup
    of the query vector (dist 0 must rank first, tie-broken by
    vec_id), exact-duplicate pairs (same and different label),
    a near-antipodal vector (cosine distance ~2 — the far edge),
    and a tiny-norm (1e-10) vector (norm underflow probe: exact
    only if both engines accumulate in double).

Usage: python3 tools/make_hostile_fixture.py [SRC_SF_DIR] [DEST_DIR]
Defaults: /root/testdata/sf0.001 /tmp/graft-hostile
"""
import shutil, sys, os
import pyarrow as pa
import pyarrow.parquet as pq

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft-hostile"

os.makedirs(dst, exist_ok=True)
for f in os.listdir(src):
    if f.endswith(".parquet") and f not in (
            "documents.parquet", "events.parquet", "embeddings.parquet"):
        shutil.copyfile(os.path.join(src, f), os.path.join(dst, f))

PASSAGE = " ".join(f"shared{i}" for i in range(1, 26))      # 25 words
HEAD10 = " ".join(f"rep{i}" for i in range(1, 11))          # 10 words
HEAD14 = " ".join(f"longrep{i}" for i in range(1, 15))      # 14 words
PHRASE4 = "echo foxtrot golf hotel"                         # 4 words

# media-hostile texts: frame ops slice the UTF-8 payload into 64-byte
# windows, so byte lengths and shared byte-prefixes are the signal
FRAME64 = "frameedge alpha bravo charlie delta echoes foxtrots golfing hh"  # 62ch + pad
FRAME64 = (FRAME64 + " zz")[:64]
assert len(FRAME64.encode()) == 64, len(FRAME64.encode())
FRAME128 = (FRAME64 + " " + "secondframe golf hotel india juliet kilo lima mike november oscar")[:128]
assert len(FRAME128.encode()) == 128, len(FRAME128.encode())


def soup(doc_id, n):
    """Deterministic filler: n words unique to this doc."""
    return " ".join(f"d{doc_id}w{(i * 7 + doc_id) % 97}x{i}" for i in range(n))


docs = []
for i in range(64):
    if i == 0:
        t = ""                                   # empty doc
    elif i == 1:
        t = "   "                                # whitespace-only
    elif i == 2:
        t = " " + soup(i, 20)                    # leading space
    elif i == 3:
        t = soup(i, 20) + " "                    # trailing space
    elif i == 5:
        t = soup(i, 10) + "  " + soup(100 + i, 10)  # double space
    elif i == 7:
        # fine-grain-only repetition: scattered 4-word phrase
        t = f"{PHRASE4} {soup(i, 6)} {PHRASE4} tail7a tail7b"
    elif i == 9:
        # coarse SIGNAL without a coarse cut: 10-word head replayed
        t = f"{HEAD10} {soup(i, 3)} {HEAD10}"
    elif i == 11:
        # coarse CUT: 14-word head replayed (span 14 >= 12)
        t = f"{HEAD14} {soup(i, 3)} {HEAD14}"
    elif i == 13:
        # both repeats in one doc, plus the shared passage for
        # cross-op interaction (repetition + cross-doc dedup)
        t = f"{HEAD14} {PASSAGE} {HEAD14} {soup(i, 5)}"
    elif i == 15:
        # near-miss GIF89a magic: the JDK GIF reader claims it then
        # throws ("Unexpected block type") -> stub path, oracle holds
        t = "GIF89a " + soup(i, 12)
    elif i == 17:
        t = "GIF87a12 34 " + soup(i, 12)        # near-miss GIF87a
    elif i == 19:
        t = "BM " + soup(i, 12)                 # near-miss BMP magic
    elif i == 21:
        t = FRAME64                              # exactly 1 full frame
    elif i == 23:
        t = FRAME128                             # exactly 2 full frames
    elif i == 25:
        t = FRAME64                              # byte-dup of doc 21
    elif i == 27:
        # shares doc 23's first 64 bytes, then diverges: exactly one
        # shared frame fingerprint
        t = FRAME64 + " " + soup(i, 10)
    elif i == 29:
        # > 3*64 bytes: the 3-frame cap binds, window 4 exists unused
        t = (soup(i, 30) + " " + soup(400 + i, 30))[:200]
    elif i == 31:
        # extraction artifacts: entities, tag openings, a URL, and a
        # literal backslash-n (the serialized-JSON-in-text tell)
        t = ("see &amp; and &lt; plus <div class leftovers "
             "https://example.com/path and a literal \\n escape " + soup(i, 6))
    elif i == 33:
        t = soup(i, 10) + " https://host.test/a?b=c " + soup(133, 6)
    elif i == 35:
        # mojibake: UTF-8-as-Latin-1 digraphs (CafÃ© = damaged
        # "Café") and a Â-lead nbsp digraph -> n_latin1 hits
        t = ("CafÃ© rÃ©sumÃ© naÃ¯ve"
             " andÂ nbsp " + soup(i, 8))
    elif i == 37:
        # mojibake: 3-byte punctuation trigraphs (donât)
        # plus a U+FFFD replacement char; the trigraph's continuation
        # chars ALSO land in the C1 range -> n_punct3, n_fffd, n_c1
        # all count on one doc (independent-counter pin)
        t = ("donât âquotedâ"
             " bad�byte " + soup(i, 8))
    elif i == 39:
        # bare C1 controls only (NEL, STS): n_c1 counts, the digraph
        # and trigraph counters must stay zero (no C2/C3/E2 lead)
        t = soup(i, 6) + " xy zw " + soup(139, 6)
    elif i == 41:
        # LLM-boilerplate leak, mixed case: three DIFFERENT markers,
        # one hit each -> dominant marker decided by the marker-order
        # tie-break
        t = ("As an AI language model, I cannot assist with that. "
             "I hope this helps! " + soup(i, 8))
    elif i == 43:
        # LLM-boilerplate leak: one marker REPEATED (2 hits) beats a
        # single different marker -> dominant by count, not order
        t = ("It's important to note that models drift. "
             "it's important to note that twice. Let's delve into it. "
             + soup(i, 6))
    elif i == 45:
        # code content: keyword signal alone (braces/semicolons under
        # the punct floor) -> is_code via CodeKwMin
        t = ("def load(x): return x "
             "import os and class Loader here " + soup(i, 8))
    elif i == 47:
        # code content: punctuation signal alone ({};) with zero
        # keywords -> is_code via CodePunctMin; also prose 'Class'
        # capitalized must NOT count as a keyword
        t = "a = {1: 2}; b = {3: 4}; Class notes; " + soup(i, 8)
    elif i == 50:
        # the benchmark doc (% 50 == 0) carries the passage
        t = f"bench50a bench50b {PASSAGE} bench50c"
    elif i == 30:
        # batch doc carrying only a 9-word SUB-SPAN of the passage:
        # the maximal scrub flags it (8-gram hits) but the 12-word
        # min-span keeps it — REAL residual-contamination signal for
        # the post-scrub audit (maximal_scrub_residual)
        sub9 = " ".join(PASSAGE.split()[:9])
        t = f"{soup(i, 4)} {sub9} {soup(330, 4)}"
    elif i % 4 == 0:
        # corpus docs sharing the passage at varied offsets
        t = f"{soup(i, i % 7)} {PASSAGE} {soup(200 + i, 5)}".strip()
    elif i % 10 == 0:
        t = f"{soup(i, 4)} {PASSAGE} {soup(300 + i, 4)}"
    else:
        t = soup(i, 18 + (i % 9))
    docs.append((i, t))

# doc 40 (%10==0 AND %4==0, an arriving batch doc) already carries the
# passage per the %4 rule above — the incremental scrubs cut it against
# the %10!=0 corpus copies.

table = pa.table({
    "doc_id": pa.array([d for d, _ in docs], pa.int64()),
    "text": pa.array([t for _, t in docs], pa.string()),
    "lang": pa.array(["en" if d % 3 else "de" for d, _ in docs], pa.string()),
    "source": pa.array([f"src{d % 5}" for d, _ in docs], pa.string()),
    "n_chars": pa.array([len(t) for _, t in docs], pa.int64()),
})
pq.write_table(table, os.path.join(dst, "documents.parquet"))
print(f"hostile fixture: {len(docs)} docs -> {dst}")

# ---------------------------------------------------------------- events
# All timestamps are int64 MICROSECONDS in [-9h, +2d] around the unix
# epoch: hourly_dense's min..max spine stays ~60 hours while epoch-0
# and pre-epoch rows get real coverage.
HOUR = 3_600_000_000
MIN30 = 1_800_000_000
events = []  # (ts_us, user_id, event_type, value, props)


def ev(ts, uid, typ, val=1.0, props='{"k": 1}'):
    events.append((ts, uid, typ, val, props))


# epoch-0 tie cluster: three events at exactly us=0, one user —
# window order must fall back to event_id; funnel's strict `us > t1`
# must NOT count the same-instant click
ev(0, 2, "view")
ev(0, 2, "click")
ev(0, 2, "purchase")
# pre-epoch rows: negative microseconds (floor-sensitive truncation)
ev(-1, 3, "click", val=-5.25)                      # 1969-12-31 23:59:59.999999
ev(-MIN30, 3, "purchase", val=0.0)                 # 23:30:00 exactly
ev(-2 * HOUR, 3, "view", val=1e15)                 # 22:00:00 exactly
# exact 30-min gaps: q11 (strict >) keeps ONE session, q26 (>=)
# breaks THREE — the two session semantics must disagree here
ev(0, 4, "view")
ev(MIN30, 4, "view")
ev(2 * MIN30, 4, "view")
# gap just over / just under the threshold (both semantics agree)
ev(0, 5, "click")
ev(MIN30 + 1, 5, "click")          # strictly > 30m: new session in both
ev(MIN30 + 1 + MIN30 - 1, 5, "click")  # 30m-1us: same session in both
# identical-ts tie cluster at a positive ts + same-instant as-of:
# the error and a click at the SAME us — inclusive `<=` must see it
ev(1_000_000, 6, "error")
ev(1_000_000, 6, "click")
ev(1_000_000, 6, "view")
ev(1_000_000, 6, "purchase")
# banded range join edges (band = 1h): clicks exactly at p-band
# (included, lives in bucket b0-1), at p-band-1us (excluded — and in
# bucket b0-2, outside the candidate explode), and at p itself
ev(2 * HOUR, 7, "purchase")
ev(1 * HOUR, 7, "click")           # = p - band, inclusive edge
ev(1 * HOUR - 1, 7, "click")       # just outside the band
ev(2 * HOUR, 7, "click")           # = p, inclusive edge
ev(HOUR + 400_000_000, 7, "click")  # mid-window
# negative-bucket purchase: p = -30min, b0 = trunc(-0.5) = 0; the
# p-band click at -90min sits in trunc(-1.5) = -1 = b0-1 — a floor
# (-2) would still cover it via b0-1? no: floor(-1.5) = -2, so a
# mixed floor/trunc bucketing would MISS it. Truncation consistency
# is what this row pins.
ev(-MIN30, 14, "purchase")
ev(-MIN30, 14, "click")            # = p
ev(-3 * MIN30, 14, "click")        # = p - band, inclusive edge
ev(-3 * MIN30 - 1, 14, "click")    # just outside
# a purchase with NO clicks in its window (inner-join drop)
ev(40 * HOUR, 8, "purchase")
# props JSON edge shapes (get_json_object / json_keys parity)
ev(3 * HOUR, 9, "error", props="{}")
ev(3 * HOUR + 1, 9, "error", props='{"z": 5}')
ev(3 * HOUR + 2, 9, "error", props='{"k": null}')
ev(3 * HOUR + 3, 9, "error", props='{"k": -5}')
ev(3 * HOUR + 4, 9, "error", props='{"k": 9223372036854775807}')
ev(3 * HOUR + 5, 9, "error", props='{"k": 3, "m": 9}')
ev(3 * HOUR + 6, 9, "signup", props='{"k": 0}', val=0.000001)
# complete funnel (distinct micros), view-only, wrong-order, and a
# same-instant click funnel (t2 NULL => t3 NULL despite a later buy)
ev(10 * HOUR, 10, "view")
ev(10 * HOUR + 1, 10, "click")
ev(10 * HOUR + 2, 10, "purchase")
ev(11 * HOUR, 11, "view")
ev(12 * HOUR, 12, "click")
ev(12 * HOUR + 1, 12, "view")
ev(13 * HOUR, 13, "view")
ev(13 * HOUR, 13, "click")         # same instant: NOT counted (strict >)
ev(14 * HOUR, 13, "purchase")      # t2 is NULL, so t3 must stay NULL
# mega-user skew + hourly-rate signal: 40 clicks bunched in one hour
# (the anomaly), a trickle elsewhere
for i in range(40):
    ev(24 * HOUR + i * 60_000_000, 1, "click", val=float(i))
for h in range(26, 34):
    ev(h * HOUR, 1, "click")
# a second day of sparse activity so cohorts/pivots span 4 calendar
# days (1969-12-31 .. 1970-01-02) and signups appear on 2+ days
ev(30 * HOUR, 2, "signup")
ev(31 * HOUR, 3, "error", val=-1.0)
ev(32 * HOUR, 4, "purchase", val=123.456789)
ev(33 * HOUR, 5, "signup")
ev(34 * HOUR, 6, "view")

ev_table = pa.table({
    "event_id": pa.array(list(range(len(events))), pa.int64()),
    "ts": pa.array([e[0] for e in events], pa.timestamp("us")),
    "user_id": pa.array([e[1] for e in events], pa.int64()),
    "event_type": pa.array([e[2] for e in events], pa.string()),
    "value": pa.array([e[3] for e in events], pa.float64()),
    "props": pa.array([e[4] for e in events], pa.string()),
})
pq.write_table(ev_table, os.path.join(dst, "events.parquet"))
print(f"hostile fixture: {len(events)} events -> {dst}")

# ------------------------------------------------------------ embeddings
# Keep the original rows (real distribution for kmeans/pq/ann) and
# APPEND hostile vectors under fresh vec_ids.
emb = pq.read_table(os.path.join(src, "embeddings.parquet"))
base = emb.to_pydict()
dim = len(base["embedding"][0])
next_id = max(base["vec_id"]) + 1
v0 = list(base["embedding"][0])   # the knn family's query vector
v1 = list(base["embedding"][1])
v2 = list(base["embedding"][2])
hostile_vecs = [
    ([0.0] * dim, 3),                                   # zero norm (quirk Q4)
    (list(v0), 9),                                      # exact dup of the QUERY vec: dist 0
    (list(v1), (base["label"][1] + 1) % 10),            # dup content, different label
    ([-x for x in v1], 2),                              # antipodal: cosine dist ~2
    (v1[:-1] + [v1[-1] + 1e-3], base["label"][1]),      # near-dup
    (list(v2), base["label"][2]),                       # dup pair, same label
    ([1e-10] * dim, 0),                                 # tiny norm (double-accum probe)
]
for i, (v, lab) in enumerate(hostile_vecs):
    base["vec_id"].append(next_id + i)
    base["embedding"].append(v)
    base["label"].append(lab)
emb_table = pa.table({
    "vec_id": pa.array(base["vec_id"], pa.int64()),
    "embedding": pa.array(base["embedding"], pa.list_(pa.float32())),
    "label": pa.array(base["label"], pa.int32()),
})
pq.write_table(emb_table, os.path.join(dst, "embeddings.parquet"))
print(f"hostile fixture: {len(base['vec_id'])} embeddings "
      f"({len(hostile_vecs)} hostile) -> {dst}")
