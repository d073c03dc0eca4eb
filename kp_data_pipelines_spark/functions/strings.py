"""String-normalization kit.

Reference behaviors re-expressed (citations into /root/reference):
- C11 regex extract                    (Saoirse Automation.ipynb:1002)
- C12 regex replace / suffix strip     (Financial Snapshot Preprocess.ipynb:240)
- C13 case/trim/split                  (Financial Snapshot Preprocess.ipynb:29-46)
- C14 whitespace-collapse normalize    (Financial Snapshot Preprocess.ipynb:124)
- C15 control-char scrub               (Financial Snapshot Preprocess.ipynb:385-389)
- F9  subtotal-row scraping            (Financial Snapshot Preprocess.ipynb:230-243)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_CONTROL_CHARS = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]"


def collapse_whitespace(col: Column | str) -> Column:
    """C14: lower + remove all whitespace — the reference's join-key
    normalizer ``"".join(s.split()).lower()``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.regexp_replace(c, r"\s+", ""))


def normalize_key(col: Column | str) -> Column:
    """Join-key canonicalization: trim + lower + collapse inner runs of
    whitespace to single spaces (less destructive than collapse_whitespace)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.regexp_replace(F.trim(c), r"\s+", " "))


def scrub_control_chars(col: Column | str) -> Column:
    """C15: strip ASCII control chars that break Excel/CSV consumers."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, _CONTROL_CHARS, "")


def strip_total_suffix(col: Column | str) -> Column:
    """F9/C12: ``"RNG123456 Total" -> "RNG123456"`` (subtotal-row scrape)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, r"(?i)\s+total$", "")
