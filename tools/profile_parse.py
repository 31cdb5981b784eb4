#!/usr/bin/env python
"""Micro-profiler for the parse/feature hot path (no Spark).

Generates N synthetic docs with the deterministic datagen row generator,
then times the pure-pandas parse_batch / text_feature_batch stages and a
candidate arrow-native variant, printing a per-stage breakdown. Run on a
quiet machine; single process.
"""
from __future__ import annotations

import cProfile
import io
import pstats
import sys
import time

import pandas as pd

sys.path.insert(0, "/root/repo")

from eventanalysis_spark.datagen import generate_pages_batch  # noqa: E402
from eventanalysis_spark.operators.parse import (  # noqa: E402
    parse_batch,
    text_feature_batch,
)


def make_batch(n: int):
    import numpy as np

    pdf = generate_pages_batch(np.arange(n))
    return pdf["url"], pdf["html"]


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    url, html = make_batch(n)

    # warm
    parse_batch(url.head(1000), html.head(1000))

    t0 = time.perf_counter()
    base, toks = parse_batch(url, html, _with_tokens=True)
    t1 = time.perf_counter()
    feats = text_feature_batch(base["text_extracted"], tokens=toks)
    t2 = time.perf_counter()
    print(f"parse_batch      : {t1-t0:6.3f}s  ({n/(t1-t0):,.0f} docs/s)")
    print(f"text_features    : {t2-t1:6.3f}s  ({n/(t2-t1):,.0f} docs/s)")
    print(f"fused total      : {t2-t0:6.3f}s  ({n/(t2-t0):,.0f} docs/s)")

    if "--profile" in sys.argv:
        pr = cProfile.Profile()
        pr.enable()
        base, toks = parse_batch(url, html, _with_tokens=True)
        text_feature_batch(base["text_extracted"], tokens=toks)
        pr.disable()
        s = io.StringIO()
        pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(30)
        print(s.getvalue())


if __name__ == "__main__":
    main()
