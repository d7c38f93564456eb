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
    if f.endswith(".parquet") and f != "documents.parquet":
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
