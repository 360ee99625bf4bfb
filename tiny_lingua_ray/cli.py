"""CLI entry points (own their Ray session, like the reference's app/App.kt).

    python -m tiny_lingua_ray.cli detect --text "bonjour le monde"
    python -m tiny_lingua_ray.cli run --input <parquet dir/file> --out /tmp/qf
    python -m tiny_lingua_ray.cli gen-corpus --rows 10000 --out /tmp/cc
    python -m tiny_lingua_ray.cli build-models
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_init(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = {}
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(
            address="local",
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
            **kwargs,
        )
    return ray


def cmd_detect(args) -> int:
    from tiny_lingua_ray.detector import LinguaDetector
    from tiny_lingua_ray.models.loader import load_dict_models
    from tiny_lingua_ray.models.train import ensure_models

    mdir = ensure_models(use_ray=False)
    det = LinguaDetector(load_dict_models(mdir))
    if args.text:
        texts = [args.text]
    else:
        texts = [ln.rstrip("\n") for ln in sys.stdin]
    for t in texts:
        if args.multi:
            # multi-language sectioning (the reference's GUI surface,
            # app/multilanguage/*) as a CLI
            from tiny_lingua_ray.multilang import detect_multi_language

            secs = detect_multi_language(det, t)
            print(
                json.dumps(
                    {
                        "text": t,
                        "sections": [
                            {
                                "start": s["start"],
                                "end": s["end"],
                                "letters": s["letters"],
                                "lang": s["lang"],
                                "section_text": t[s["start"] : s["end"]],
                                "top": [
                                    (c["lang"], round(c["conf"], 4))
                                    for c in s["confidences"][:3]
                                ],
                            }
                            for s in secs
                        ],
                    },
                    ensure_ascii=False,
                )
            )
            continue
        conf = det.confidence_values(t)
        lang = det._language_from_confidences(conf)
        top = [(l, round(v, 4)) for l, v in conf[:3]]
        print(json.dumps({"text": t, "lang": lang, "top": top}))
    return 0


def cmd_run(args) -> int:
    ray = _ray_init(args.num_cpus)
    from tiny_lingua_ray.pipelines.quality_filter import (
        QualityFilterConfig,
        run_quality_filter,
    )

    cfg = QualityFilterConfig(num_partitions=args.partitions)
    summary = run_quality_filter(
        args.input, args.out, cfg, resume=not args.no_resume
    )
    print(json.dumps(summary))
    ray.shutdown()
    return 0


def cmd_gen_corpus(args) -> int:
    from tiny_lingua_ray.sources.cc_pages import build_cc_pages

    out = build_cc_pages(args.out, total_rows=args.rows, use_ray=False)
    print(str(out))
    return 0


def cmd_query(args) -> int:
    """Run any registered operator pipeline over an sf-format table dir
    and write / print its result — every queries() entry is a runnable
    product surface, not just a test hook."""
    from tiny_lingua_ray.pipelines.queries import QUERIES

    if args.list:
        for k in sorted(QUERIES):
            print(k)
        return 0
    if args.name not in QUERIES:
        print(f"unknown query: {args.name!r} (use --list)", flush=True)
        return 2
    ray = _ray_init(args.num_cpus)
    res = QUERIES[args.name](args.sf_dir)
    import pandas as pd

    if args.out:
        if isinstance(res, pd.DataFrame):
            import pyarrow as pa
            import pyarrow.parquet as pq

            pq.write_table(
                pa.Table.from_pandas(res, preserve_index=False), args.out
            )
            n = len(res)
        else:
            # Dataset: materialize ONCE, then write + count from the
            # same blocks (write_parquet would otherwise consume the
            # lazy plan and count() would re-run the whole DAG)
            res = res.materialize()
            res.write_parquet(args.out)
            n = res.count()
        print(f"{args.name}: {n} rows -> {args.out}")
    else:
        df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
        print(df.head(args.head).to_string())
        print(f"[{len(df)} rows]")
    ray.shutdown()
    return 0


def cmd_build_models(args) -> int:
    from tiny_lingua_ray.models.train import ensure_models

    # both per-mode dirs: a build that populated only the high dir would
    # leave `accuracy-report --low-accuracy` retraining all 75 languages
    # inside every scorer actor's constructor (review r5)
    print(str(ensure_models(use_ray=False)))
    print(str(ensure_models(use_ray=False, low_mode=True)))
    return 0


def cmd_accuracy_report(args) -> int:
    ray = _ray_init(args.num_cpus)
    from tiny_lingua_ray.pipelines.accuracy_report import (
        run_accuracy_report,
        write_reports,
    )

    agg = run_accuracy_report(
        low_accuracy=args.low_accuracy,
        limit_per_file=args.limit,
        concurrency=args.concurrency,
    )
    out = write_reports(agg, args.out)
    overall = agg.groupby("true_lang")["accuracy_pct"].mean().mean()
    print(
        json.dumps(
            {
                "out": str(out),
                "languages": int(agg["true_lang"].nunique()),
                "mean_accuracy_pct": round(float(overall), 2),
            }
        )
    )
    ray.shutdown()
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="tiny_lingua_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("detect", help="detect language of text/stdin lines")
    d.add_argument("--text")
    d.add_argument(
        "--multi", action="store_true",
        help="multi-language sectioning (per-section language + confidences)",
    )
    d.set_defaults(fn=cmd_detect)

    r = sub.add_parser("run", help="run the quality-filter pipeline")
    r.add_argument("--input", required=True)
    r.add_argument("--out", required=True)
    r.add_argument("--partitions", type=int, default=64)
    r.add_argument("--num-cpus", type=int, default=None)
    r.add_argument("--no-resume", action="store_true")
    r.set_defaults(fn=cmd_run)

    g = sub.add_parser("gen-corpus", help="generate synthetic cc_pages")
    g.add_argument("--rows", type=int, default=10_000)
    g.add_argument("--out", required=True)
    g.set_defaults(fn=cmd_gen_corpus)

    b = sub.add_parser("build-models", help="build n-gram model tables")
    b.set_defaults(fn=cmd_build_models)

    q = sub.add_parser(
        "query", help="run a registered operator pipeline over an sf dir"
    )
    q.add_argument("--name", default="")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    q.add_argument("--out", default=None,
                   help="parquet output path/dir (default: print head)")
    q.add_argument("--head", type=int, default=10)
    q.add_argument("--list", action="store_true",
                   help="list available query names")
    q.add_argument("--num-cpus", type=int, default=None)
    q.set_defaults(fn=cmd_query)

    a = sub.add_parser(
        "accuracy-report", help="run the conformance accuracy report"
    )
    a.add_argument("--out", default="reports/accuracy")
    a.add_argument("--limit", type=int, default=None)
    a.add_argument("--low-accuracy", action="store_true")
    a.add_argument("--concurrency", type=int, default=8)
    a.add_argument("--num-cpus", type=int, default=None)
    a.set_defaults(fn=cmd_accuracy_report)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
