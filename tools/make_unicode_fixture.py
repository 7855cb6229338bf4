#!/usr/bin/env python3
"""Dev-only MULTIBYTE/UNICODE fixture variant (r11).

The NULL fixture exercises three-valued logic and the empty-string
fixture exercises zero-length edges; THIS one exercises the remaining
string-semantics axis: characters whose UTF-8 encoding is >1 byte and
whose "length" is engine-convention-dependent. ~12% of documents get
multibyte words spliced into their text (CJK, accented latin, emoji
incl. a surrogate-pair-in-UTF-16 codepoint, combining diacritics), and
~8% of customers get an accented name (the levenshtein/substr path in
the fuzzy-dedup family). Divergence classes this can reveal:

  - length()/substr() counting code UNITS vs code POINTS vs grapheme
    clusters (U+1F600 is 1 code point, 2 UTF-16 units, 4 UTF-8 bytes;
    "e" + U+0301 is 2 code points, 1 grapheme)
  - levenshtein over bytes vs code points
  - upper/lower behaviour on accented letters
  - md5/hashing is byte-based on both engines (UTF-8), so hash-keyed
    ops should NOT diverge — the sweep proves that claim

Deterministic (hash-of-key, no RNG); all other columns untouched.

Usage: python3 tools/make_unicode_fixture.py [srcSfDir] [destDir]
Then:  sbt "runMain graft.Verify <destDir> /tmp/verify_uni"
       python3 tools/check.py <destDir> /tmp/verify_uni
"""
import hashlib, os, shutil, sys

import pyarrow as pa
import pyarrow.parquet as pq

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_unifix"
os.makedirs(dst, exist_ok=True)
for f in os.listdir(src):
    if f.endswith(".parquet"):
        shutil.copy(f"{src}/{f}", f"{dst}/{f}")

# one word per divergence class; spliced as whole space-separated tokens
# so tokenization stays word-aligned while char arithmetic goes multibyte
WORDS = [
    "caf\u00e9",            # precomposed accent (2-byte UTF-8)
    "na\u00efve",           # diaeresis
    "\u65e5\u672c\u8a9e", # CJK (3-byte UTF-8 each)
    "\U0001f600data",       # emoji: 4-byte UTF-8, UTF-16 surrogate pair
    "e\u0301clair",         # COMBINING acute: 2 code points, 1 grapheme
    "\u00dcber",            # uppercase umlaut (case-mapping edge)
]


def h(salt, k):
    return int(hashlib.md5(f"{salt}:{k}".encode()).hexdigest()[:8], 16)


def splice_docs(path):
    t = pq.read_table(path)
    ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    out, hit = [], 0
    for i, (k, v) in enumerate(zip(ids, texts)):
        if v is not None and h("uni", k) % 8 == 0:
            w = WORDS[h("pick", k) % len(WORDS)]
            toks = v.split(" ")
            pos = h("pos", k) % (len(toks) + 1)
            out.append(" ".join(toks[:pos] + [w] + toks[pos:]))
            hit += 1
        else:
            out.append(v)
    t = t.set_column(t.schema.get_field_index("text"), "text",
                     pa.array(out, pa.string()))
    pq.write_table(t, path)
    print(f"{path}: multibyte words spliced into {hit} docs")


def accent_names(path):
    t = pq.read_table(path)
    ids = t.column("c_custkey").to_pylist()
    names = t.column("c_name").to_pylist()
    out, hit = [], 0
    for k, v in zip(ids, names):
        if v is not None and h("cname", k) % 12 == 0:
            # swap one char for its accented sibling: same code-point
            # length, different byte length — a byte-based levenshtein
            # would over-count this edit
            out.append(v.replace("e", "é", 1) if "e" in v
                       else v + "é")
            hit += 1
        else:
            out.append(v)
    t = t.set_column(t.schema.get_field_index("c_name"), "c_name",
                     pa.array(out, pa.string()))
    pq.write_table(t, path)
    print(f"{path}: accented {hit} customer names")


splice_docs(f"{dst}/documents.parquet")
accent_names(f"{dst}/customer.parquet")
