#!/usr/bin/env python
"""Cross-engine unicode parity probe for the text-normalizing gates.

The driver's testdata is ASCII, so a Spark-vs-DuckDB divergence that only
manifests on exotic codepoints can never trip the oracle gate.  The live
hazard class is case mapping: Java's ``toLowerCase`` maps characters with
multi-codepoint lowercase forms (U+0130 'İ' -> 'i' + combining dot
U+0307) while DuckDB's utf8proc maps them to the bare base letter, so any
gate that lowercases before a regex tokenize counts/splits differently on
the two engines for such text.  d11 closes it by deleting ``\\p{Mn}``
after lowering on BOTH engines (dedup.py, r10); this probe measures which
other gates still carry the latent divergence, so the r11 window can fix
them with the same recipe when they ride it.

Builds a small documents table whose rows hit each known hazard class
(multi-codepoint lowers, decomposed accents, ligatures/digraphs, overlay
marks, PII/URL shapes interleaved with İ), copies the sf0.001 fixtures
for every other table, and runs tools/check_correctness.py over the text
gates.  A FAIL here on a gate that is green on the driver's testdata is a
LATENT unicode divergence, not a wrong answer on the graded corpus.

Usage: python tools/unicode_parity_probe.py [gate ...]
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tempfile

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURES = os.environ.get("SPARK_GRAFT_FIXTURE_SF", "/root/testdata/sf0.001")

# one row per hazard class; keep İ in several shapes since it is the
# class with a measured live divergence (t03: +2 bpe-ish tokens per İ on
# the Spark side)
TEXTS = [
    "İstanbul normal words follow here for the gate to chew on",
    "café vs café decomposed é and precomposed é mixed tokens",
    "STRASSE ß ĲSSELMEER ǅungla ﬁligature upper lower mix",
    "plain ascii control text one two three four five six seven eight",
    "email test@example.com phone 555-123-4567 ssn 123-45-6789 İ drift",
    "repeat repeat repeat repeat repeat repeat repeat repeat",
    "https://EXAMPLE.com/Path?q=1 and http://sub.İstanbul.example.org/x visit",
]

DEFAULT_GATES = [
    "d05_decontamination",
    "d11_fuzzy_decontamination",
    "t01_language_id",
    "t02_quality_score",
    "t03_token_count",
    "t04_fingerprint",
    "t05_feature_hash_embedding",
    "t06_topk_bigrams_per_lang",
    "t07_repetition_ratio",
    "t08_pii_scrub",
    "t09_url_domain_stats",
    "t10_char_entropy",
    "t11_bigram_lm_perplexity",
]


def main() -> int:
    gates = sys.argv[1:] or DEFAULT_GATES
    tmp = tempfile.mkdtemp(prefix="unicode_parity_")
    try:
        df = pd.DataFrame(
            {
                "doc_id": range(1, len(TEXTS) + 1),
                "text": TEXTS,
                "lang": ["en"] * len(TEXTS),
                "source": ["web"] * len(TEXTS),
                "n_chars": [len(t) for t in TEXTS],
            }
        )
        pq.write_table(
            pa.Table.from_pandas(df, preserve_index=False),
            os.path.join(tmp, "documents.parquet"),
        )
        for t in (
            "region nation customer supplier part orders lineitem events embeddings"
        ).split():
            src = os.path.join(FIXTURES, f"{t}.parquet")
            dst = os.path.join(tmp, f"{t}.parquet")
            (shutil.copytree if os.path.isdir(src) else shutil.copy)(src, dst)
        return subprocess.call(
            [sys.executable, os.path.join(REPO, "tools", "check_correctness.py"), tmp]
            + gates
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
