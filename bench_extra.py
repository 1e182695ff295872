#!/usr/bin/env python
"""Per-query measurement harness for the optimization round (guide §1).

NOT the driver bench (bench.py is frozen): this script isolates each
declared bench query with the noop sink (guide §1.4) so we time the
computation, not the sink, labels every job (§1.5), and dumps
``.explain("formatted")`` for the plan-shape evidence committed under
plans/r07/.

Usage:
    python bench_extra.py [--sf-dir DIR] [--reps N] [--plans-dir DIR]
                          [--tag TAG] [--queries q1,q2,...] [--pipeline]

Host noise is ±30-40% (CLAUDE.md) — never A/B across separate runs of
this script; for change attribution use --queries with an interleaved
worktree protocol or in-process A/B instead.
"""

from __future__ import annotations

import argparse
import json
import os
import time

REPO = os.path.dirname(os.path.abspath(__file__))

BENCH_QUERIES = [
    "rel_q1",
    "jw_topk",
    "jw_pairs",
    "dedup_exact",
    "pipeline_lsh_pairs",
    "pipeline_simhash_pairs",
    "ann_cosine_topk",
    "ann_cosine_topk_ivf",
    "dedup_embedding_lsh",
    "dedup_substring_exact",
    "events_sessions",
    "events_session_window",
    "text_quality",
    "pipeline_clusters_star",
    "mm_frame_samples_gif",
    "mm_frame_samples_wav",
    "mm_frame_samples_mp4",
    "mm_frame_samples_mp3",
    "mm_frame_samples_webm",
    "mm_jpeg_meta",
    "mm_jpeg_decode",
    "mm_resize_jpeg",
    "mm_frame_features",
    "mm_frame_samples_corrupt",
    "pipeline_lsh_pairs_exact",
    "pipeline_simhash_pairs_exact",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--plans-dir", default=None, help="dump explain('formatted') per query")
    ap.add_argument("--plans-suffix", default="before")
    ap.add_argument("--tag", default="r07")
    ap.add_argument("--queries", default=None, help="comma list; default = bench.py's list")
    ap.add_argument("--pipeline", action="store_true", help="also time the end-to-end pipeline")
    ap.add_argument("--out", default=None, help="write JSON results here")
    args = ap.parse_args()

    import tempfile

    import __spark_entry__ as entry_mod
    from batch_jaro_winkler_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(f"bjws-extra-{args.tag}", cores=cpus, shuffle_partitions=max(cpus, 8))
    sc = spark.sparkContext

    names = args.queries.split(",") if args.queries else list(BENCH_QUERIES)
    q = entry_mod.queries()
    results: dict[str, list[float]] = {}

    if args.pipeline:
        from batch_jaro_winkler_spark.operators.config import DedupConfig
        from batch_jaro_winkler_spark.pipeline import DedupPipeline

        docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
        times = []
        for rep in range(args.reps):
            sc.setJobDescription(f"pipeline rep{rep}")
            t0 = time.time()
            pipe = DedupPipeline(spark, DedupConfig(), tempfile.mkdtemp(prefix="bjws_extra_"))
            pipe.run(docs, "doc_id", "text").count()
            times.append(round(time.time() - t0, 3))
        results["dedup_pipeline"] = times
        print(json.dumps({"query": "dedup_pipeline", "times": times}), flush=True)

    if args.plans_dir:
        os.makedirs(args.plans_dir, exist_ok=True)

    for name in names:
        df = q[name](spark, args.sf_dir)
        if args.plans_dir:
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(
                os.path.join(args.plans_dir, f"{name}_{args.plans_suffix}.txt"), "w"
            ) as fh:
                fh.write(buf.getvalue())
        times = []
        for rep in range(args.reps):
            if rep:
                # rebuild per rep: a lazy localCheckpoint inside a query
                # would otherwise carry materialized blocks into the next
                # rep and fake the timing
                df = q[name](spark, args.sf_dir)
            sc.setJobDescription(f"{name} rep{rep}")
            t0 = time.time()
            # noop sink: computes every column of every row, discards
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
        sc.setJobDescription(None)
        results[name] = times
        print(json.dumps({"query": name, "times": times}), flush=True)

    if args.out:
        with open(args.out, "w") as fh:
            json.dump({"sf_dir": args.sf_dir, "reps": args.reps, "queries": results}, fh, indent=1)
    print(json.dumps({"tag": args.tag, "done": True, "n": len(results)}))


if __name__ == "__main__":
    main()
