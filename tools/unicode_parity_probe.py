#!/usr/bin/env python
"""Cross-engine unicode parity probe for the text-normalizing gates.

The driver's testdata is ASCII, so a Spark-vs-DuckDB divergence that only
manifests on exotic codepoints can never trip the oracle gate.  The live
hazard class is case mapping: Java's ``toLowerCase`` maps characters with
multi-codepoint lowercase forms (U+0130 'İ' -> 'i' + combining dot
U+0307) while DuckDB's utf8proc maps them to the bare base letter, so any
gate that lowercases before a regex tokenize counts/splits differently on
the two engines for such text.  d11 and d05 close it by deleting
``\\p{Mn}`` after lowering on BOTH engines (dedup.py, r10); this probe
measures which other gates still carry the latent divergence, so the r11
window can fix them with the same recipe when they ride it.

Builds a small documents table whose rows hit each known hazard class
(multi-codepoint lowers, decomposed accents, ligatures/digraphs, overlay
marks, PII/URL shapes interleaved with İ), symlinks the sf0.001 fixtures
for every other table, and runs tools/check_correctness.py over the text
gates.  A FAIL here on a gate that is green on the driver's testdata is a
LATENT unicode divergence, not a wrong answer on the graded corpus.

Two d05/d11 requirements are load-bearing and easy to break silently:
- doc_ids 20 and 52 sit in the gates' 1-in-20 md5 benchmark sample
  (``_BENCH_PRED_SQL``); without sampled docs both decontamination gates
  return zero rows on both engines and their "parity" is vacuous.
- the bench-sampled docs share verbatim ≥8-token runs (with İ inside the
  run) with train docs, so the contamination joins actually fire and the
  lowercase path is exercised on comparable output.

Exit code 0 iff the measured PASS/FAIL partition matches EXPECTED_FAIL
exactly — a clean gate newly failing OR an expected-fail gate silently
passing both exit 1 and print an UNEXPECTED line, so the probe works as
an automated tripwire even while known latent divergences remain.

Usage: python tools/unicode_parity_probe.py [gate ...]
"""

from __future__ import annotations

import os
import re
import subprocess
import sys
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURES = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# A ≥8-token verbatim run with the İ hazard inside it, shared between
# bench-sampled docs (20, 52) and train docs, so d05's exact 8-gram join
# and d11's normalized-shingle join both produce rows.  d11 additionally
# needs the re-cased/re-punctuated variant to STILL collide after its
# normalization.
SHARED_RUN = "the İstanbul lecture notes cover eight shared tokens exactly here"
SHARED_RECASED = "The İSTANBUL lecture, notes cover eight shared tokens exactly here!"

# (doc_id, text): ids 20 and 52 are in the 1-in-20 md5 benchmark sample
# (verified against _BENCH_PRED_SQL); every other id is train-side.
DOCS = [
    (1, "İstanbul normal words follow here for the gate to chew on"),
    (2, "café vs café decomposed é and precomposed é mixed tokens"),
    (3, "STRASSE ß ĲSSELMEER ǅungla ﬁligature upper lower mix"),
    (4, "plain ascii control text one two three four five six seven eight"),
    (5, "email test@example.com phone 555-123-4567 ssn 123-45-6789 İ drift"),
    (6, "repeat repeat repeat repeat repeat repeat repeat repeat"),
    (7, "https://EXAMPLE.com/Path?q=1 and http://sub.İstanbul.example.org/x visit"),
    (8, f"train doc quoting verbatim {SHARED_RUN} plus trailing context"),
    (9, f"another train doc with drift {SHARED_RECASED} and more words"),
    (20, f"benchmark sampled doc containing {SHARED_RUN} inside it"),
    (52, f"second sampled benchmark doc {SHARED_RUN} again for overlap"),
    # r13 close-out: the Unicode-version skew + final-sigma classes the
    # fold supplements close (queries._FOLD_* + the ς->σ normalization;
    # tools/gen_unicode_fold_skew.py): Vithkuqi upper \U00010570, Latin
    # Ext-D Ꟁ/Ɤ, new combining marks ࢘/ᫌ, a Znamenny
    # mark \U0001CF00, the reclassified ᜴, and word-final Σ.  Any
    # fold-consuming gate regressing on the supplements trips here.
    (10, "skew \U00010570ΑΣ n࢘oᫌt Ꟁx Ɤy m\U0001CF00k p᜴q ΟΔΥΣΣΕΥΣ ΣΙΣΥΦΟΣ ends"),
]

# gate -> why it is EXPECTED to fail on this corpus today.  EMPTY as of
# r11: the \\p{Mn}-after-lower recipe landed on every gate that
# lowercases before tokenizing/hashing (t03's bpe facet via F.lit-carried
# explicit classes, t04/p02 via the shared canon_text helpers, t05/t06
# via ws_words over the mark-stripped lower, t11's alphabet normalize) —
# all 13 default gates are parity-clean.  A new entry here means a
# REGRESSION (or a new gate shipped without the recipe).
EXPECTED_FAIL: dict[str, str] = {}

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
    unknown = [g for g in gates if g not in DEFAULT_GATES]
    if unknown:
        # catch typos BEFORE the subprocess silently filters them away
        # (check_correctness's `only` filter skips unregistered names);
        # non-default registered gates are fine to probe explicitly, so
        # only reject names the registry itself does not know
        names = subprocess.run(
            [sys.executable, "-c",
             "from jena_fuseki_kafka_spark.queries import QUERIES;"
             "print('\\n'.join(QUERIES))"],
            cwd=REPO, capture_output=True, text=True,
        ).stdout.split()
        bad = [g for g in unknown if g not in names]
        if bad:
            print(f"unknown gate name(s): {bad}", file=sys.stderr)
            return 2
    tmp = tempfile.mkdtemp(prefix="unicode_parity_")
    try:
        ids = [i for i, _ in DOCS]
        texts = [t for _, t in DOCS]
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(ids, type=pa.int64()),
                    "text": texts,
                    "lang": ["en"] * len(DOCS),
                    "source": ["web"] * len(DOCS),
                    "n_chars": [len(t) for t in texts],
                }
            ),
            os.path.join(tmp, "documents.parquet"),
        )
        for t in (
            "region nation customer supplier part orders lineitem events embeddings"
        ).split():
            os.symlink(
                os.path.join(FIXTURES, f"{t}.parquet"),
                os.path.join(tmp, f"{t}.parquet"),
            )
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "check_correctness.py"), tmp]
            + gates,
            capture_output=True,
            text=True,
        )
        sys.stderr.write(proc.stderr[-2000:] if proc.stderr else "")
        print(proc.stdout, end="")
        measured = {
            m.group(2): m.group(1)
            for m in re.finditer(r"^(PASS|FAIL) (\S+?):?\s", proc.stdout, flags=re.M)
        }
        ok = True
        for g in gates:
            got = measured.get(g)
            want = "FAIL" if g in EXPECTED_FAIL else "PASS"
            if got is None:
                print(f"UNEXPECTED: {g} produced no verdict")
                ok = False
            elif got != want:
                why = EXPECTED_FAIL.get(g, "expected parity-clean")
                print(f"UNEXPECTED: {g} {got} (expected {want}: {why})")
                ok = False
        if ok:
            print(f"partition as expected ({len(gates)} gates, "
                  f"{sum(1 for g in gates if g in EXPECTED_FAIL)} known-latent)")
        return 0 if ok else 1
    finally:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
