"""Scaling measurement for the round-5 multimodal additions: resize,
video decode, per-frame extraction. Runs each op at 1x (sf0.1 documents)
and 10x (/tmp/docs10x replica corpus if present), best-of-2 with
clearCache between trials, and prints one JSON line.

Usage: python tools/bench_multimodal_scale.py
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    import os

    from pyspark.sql import functions as F

    from vertica_hadoop_integration__spark.operators import multimodal as M
    from vertica_hadoop_integration__spark.session import get_session

    spark = get_session("mm-scale")
    docs_1x = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    corpora = {"1x": docs_1x}
    if os.path.isdir("/tmp/docs10x"):
        corpora["10x"] = spark.read.parquet("/tmp/docs10x")

    def run(docs):
        out = {}
        ops = {
            "resize": lambda d: M.resize_images(
                M.synthesize_textured_media(d), 16, 16
            ).agg(F.sum("n_bytes")),
            "video_decode": lambda d: M.extract_features(
                M.synthesize_real_video_media(d), decoder="real"
            ).agg(F.sum("n_bytes")),
            "video_frames": lambda d: M.video_frame_extract(
                M.synthesize_real_video_media(d)
            ).agg(F.count(F.lit(1)), F.sum("frame_mean")),
        }
        for name, fn in ops.items():
            trials = []
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.monotonic()
                fn(docs).collect()
                trials.append(round(time.monotonic() - t0, 3))
            out[name] = {"best": min(trials), "trials": trials}
        return out

    result = {scale: run(d) for scale, d in corpora.items()}
    print(json.dumps(result))


if __name__ == "__main__":
    main()
