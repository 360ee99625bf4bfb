"""Confidence/accuracy conformance report vs the reference's published CSV.

The reference's regression gate regenerates its accuracy reports and diffs
them against the committed ones (README.md:48-50).  Our closest achievable
analogue — given the documented model-provenance gap (upstream Lingua model
JSON unavailable offline; models are trained from the accuracy corpus,
models/__init__.py) — is: run the full 75x3x1000 corpus through
pipelines/accuracy_report in BOTH accuracy modes and tabulate per-language
deltas against /root/reference/accuracy-reports/aggregated-accuracy-values.csv
(columns *-lingua-high / *-lingua-low).

Outputs (committed under reports/):
  reports/accuracy/          per-language txt + aggregated CSV (high accuracy)
  reports/accuracy-low/      same, low-accuracy (trigram-only) mode
  reports/conformance-delta.csv  per-language ours vs reference + delta

Run standalone from /root/repo:  python tools/conformance_report.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPO = Path(__file__).resolve().parent.parent
REF_CSV = Path("/root/reference/accuracy-reports/aggregated-accuracy-values.csv")


def build_delta(high_csv: Path, low_csv: Path, out_csv: Path) -> pd.DataFrame:
    ours_hi = pd.read_csv(high_csv)[["language", "average"]].rename(
        columns={"average": "ours_high"}
    )
    ours_lo = pd.read_csv(low_csv)[["language", "average"]].rename(
        columns={"average": "ours_low"}
    )
    ref = pd.read_csv(REF_CSV)[
        ["language", "average-lingua-high", "average-lingua-low"]
    ].rename(
        columns={
            "average-lingua-high": "ref_lingua_high",
            "average-lingua-low": "ref_lingua_low",
        }
    )
    d = ours_hi.merge(ours_lo, on="language").merge(ref, on="language", how="left")
    d["delta_high"] = (d["ours_high"] - d["ref_lingua_high"]).round(2)
    d["delta_low"] = (d["ours_low"] - d["ref_lingua_low"]).round(2)
    d = d.sort_values("language", ignore_index=True).round(2)
    d.to_csv(out_csv, index=False)
    return d


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=32,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from tiny_lingua_ray.models.train import ensure_models
    from tiny_lingua_ray.pipelines.accuracy_report import (
        run_accuracy_report,
        write_reports,
    )

    # build once on the driver (both per-mode model dirs); actors mmap
    ensure_models()
    ensure_models(low_mode=True)
    for low, out_dir in ((False, "accuracy"), (True, "accuracy-low")):
        agg = run_accuracy_report(low_accuracy=low, concurrency=16)
        write_reports(agg, REPO / "reports" / out_dir)
        mode = "low" if low else "high"
        print(
            f"{mode}: mean per-(lang,split) accuracy "
            f"{agg['accuracy_pct'].mean():.2f}% over {int(agg['n'].sum())} lines"
        )
    d = build_delta(
        REPO / "reports" / "accuracy" / "aggregated-accuracy-values.csv",
        REPO / "reports" / "accuracy-low" / "aggregated-accuracy-values.csv",
        REPO / "reports" / "conformance-delta.csv",
    )
    print(
        f"delta vs reference: mean high {d['delta_high'].mean():+.2f} "
        f"(abs {d['delta_high'].abs().mean():.2f}), "
        f"mean low {d['delta_low'].mean():+.2f} "
        f"(abs {d['delta_low'].abs().mean():.2f}) over {len(d)} languages"
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
