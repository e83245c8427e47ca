"""Helpers for struct-input scalar pandas UDFs.

A struct column arrives in a pandas UDF as a pd.DataFrame; nullable
int/bool fields surface as float NaN / object None. These helpers
normalize each record to plain-Python values so serializers can rely
on None for missing and int for integral fields.
"""

from __future__ import annotations

import math

import pandas as pd


def clean_value(v):
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    return v


def records(pdf: pd.DataFrame) -> list[dict]:
    return [{k: clean_value(v) for k, v in rec.items()} for rec in pdf.to_dict("records")]


def seq(v) -> list:
    """None/NaN -> []; numpy arrays -> list (truthiness-safe)."""
    v = clean_value(v)
    if v is None:
        return []
    return list(v)
