"""Batch-inference operator (SURVEY.md X4 — LLM Testing.ipynb:315-371).

The reference loads an HF causal LM, generates per row, and regex-parses
``analysis``/``final`` channels out of the raw output. The Spark-first
shape is an **iterator-of-batches Pandas UDF pipeline**:

- model load happens once per Python worker (the iterator pattern), not
  per row/batch — the distributed equivalent of the notebook's single
  in-process model;
- batches arrive as Arrow-backed pandas Series (vectorized transfer);
- answer-channel parsing is NOT Python — it's ``regexp_extract`` back on
  the JVM side.

The model call itself is pluggable; this environment has no torch/HF, so
``MODELS`` ships a deterministic fake scorer (tested) and a loader stub
that raises until a real backend is registered.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType


def _fake_model() -> Callable[[pd.Series], pd.Series]:
    """Deterministic stand-in 'LLM': emits the reference's two-channel
    output format so the downstream regex parse is exercised for real."""

    def generate(texts: pd.Series) -> pd.Series:
        def _one(t: str) -> str:
            words = (t or "").split()
            analysis = f"tokens={len(words)} uniq={len(set(words))}"
            final = "long" if len(words) > 40 else "short"
            return f"<analysis>{analysis}</analysis><final>{final}</final>"

        return texts.map(_one)

    return generate


def _real_model() -> Callable[[pd.Series], pd.Series]:
    """Real HF causal-LM backend (the reference's model at LLM
    Testing.ipynb:315-371), active when torch+transformers are
    installed; raises NotImplementedError otherwise (this sandbox has
    neither). Model name comes from ``KP_INFERENCE_MODEL`` (default a
    tiny public test model so CI-with-deps stays fast). Satisfies the
    same contract as the fake: ``pd.Series[str] -> pd.Series[str]``,
    same length, one output per input — pinned by the shared contract
    test in tests/test_multimodal_inference.py."""
    try:
        import torch
        from transformers import AutoModelForCausalLM, AutoTokenizer
    except ImportError as e:
        raise NotImplementedError(
            "no inference backend in this environment (torch/transformers "
            "missing); install them or register a loader in MODELS"
        ) from e
    import os

    name = os.environ.get("KP_INFERENCE_MODEL", "sshleifer/tiny-gpt2")
    tok = AutoTokenizer.from_pretrained(name)
    if tok.pad_token is None:
        tok.pad_token = tok.eos_token
    model = AutoModelForCausalLM.from_pretrained(name)
    model.eval()

    def generate(texts: pd.Series) -> pd.Series:
        vals = ["" if t is None else str(t) for t in texts]
        enc = tok(
            vals, return_tensors="pt", padding=True, truncation=True,
            max_length=256,
        )
        with torch.no_grad():
            out = model.generate(
                **enc, max_new_tokens=32, do_sample=False,
                pad_token_id=tok.pad_token_id,
            )
        dec = tok.batch_decode(out, skip_special_tokens=True)
        return pd.Series(dec, index=texts.index)

    return generate


MODELS: dict[str, Callable[[], Callable[[pd.Series], pd.Series]]] = {
    "fake": _fake_model,
    "real": _real_model,
}


def llm_generate(text_col: str, model: str = "fake") -> Column:
    """Iterator-of-series Pandas UDF: per-worker model init, Arrow batches."""
    loader = MODELS[model]

    @F.pandas_udf(StringType())
    def generate(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        model_fn = loader()  # once per worker process
        for batch in batches:
            yield model_fn(batch)

    return generate(F.col(text_col))


def parse_channels(df: DataFrame, raw_col: str = "raw_output") -> DataFrame:
    """The reference's regex answer-split, JVM-side: extract
    ``<analysis>``/``<final>`` channels with regexp_extract."""
    return df.withColumns(
        {
            "analysis": F.regexp_extract(raw_col, r"<analysis>(.*?)</analysis>", 1),
            "final": F.regexp_extract(raw_col, r"<final>(.*?)</final>", 1),
        }
    )


def batch_inference(df: DataFrame, text_col: str, model: str = "fake") -> DataFrame:
    """Full X4 pipeline: generate (pandas_udf) -> parse channels (JVM)."""
    return parse_channels(df.withColumn("raw_output", llm_generate(text_col, model)))
