"""North-rule gate: pipeline keep/drop + scrubbed text vs reference labels.

"Reference labels" are produced by the pinned pure-Python implementation
(detector + stage functions run row-by-row, no Ray) — itself pinned to the
reference's golden fixtures (tests/test_golden.py).  The distributed
pipeline must reproduce them at F1 >= 0.99, with byte-identical scrubbed
text per url (BASELINE.md targets).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _reference_labels(table: pa.Table, det, max_pp: float, qmask: int):
    """Row-by-row pure-Python keep/drop + scrub (no Ray)."""
    from tiny_lingua_ray.detector import clean_up_input_text
    from tiny_lingua_ray.models.train import letter_run_pattern
    from tiny_lingua_ray.stages.extract import extract_text
    from tiny_lingua_ray.stages.perplexity import (
        TrigramBackoffResolver,
        trigram_occurrences,
    )
    from tiny_lingua_ray.stages.quality import quality_batch
    from tiny_lingua_ray.stages.scrub import scrub_text

    pat = letter_run_pattern()
    resolver = TrigramBackoffResolver(
        {l: det_packed for l, det_packed in _packed().items()}
    )

    keeps, scrubbed_list = [], []
    texts = table.column("text").to_pylist()
    htmls = table.column("html").to_pylist()
    qflags = quality_batch(
        pa.table({"text": texts}), text_column="text"
    ).column("quality_flags").to_pylist()

    for i, (html, text) in enumerate(zip(htmls, texts)):
        extracted = extract_text(html)
        if extracted != (text or ""):
            keeps.append(False)
            scrubbed_list.append(scrub_text(extracted)[0])
            continue
        lang = det.detect(extracted)
        scrubbed = scrub_text(extracted)[0]
        scrubbed_list.append(scrubbed)
        if lang == "unknown":
            keeps.append(False)
            continue
        if qflags[i] & qmask:
            keeps.append(False)
            continue
        grams = trigram_occurrences(clean_up_input_text(extracted), pat)
        if grams and lang in resolver.models:
            logp = resolver.resolve(lang, grams)
            pp = float(np.exp(-logp.mean()))
            if pp > max_pp:
                keeps.append(False)
                continue
        keeps.append(True)
    return keeps, scrubbed_list


_PACKED_CACHE = {}


def _packed():
    if not _PACKED_CACHE:
        from tiny_lingua_ray.models.loader import load_packed_models
        from tiny_lingua_ray.models.train import default_models_dir

        _PACKED_CACHE.update(
            load_packed_models(default_models_dir(), orders="low")
        )
    return _PACKED_CACHE


@pytest.mark.slow
def test_pipeline_matches_reference_labels(ray_session, models_dir):
    import ray.data as rd

    from tiny_lingua_ray.detector import LinguaDetector
    from tiny_lingua_ray.models.loader import load_dict_models
    from tiny_lingua_ray.pipelines.quality_filter import (
        QualityFilterConfig,
        quality_filter_dataset,
    )
    from tiny_lingua_ray.sources.cc_pages import make_shard

    table = make_shard(3, 1000)
    cfg = QualityFilterConfig(
        num_partitions=8,
        langid_concurrency=2,
        batch_size=256,
        use_fasttext_fallback=False,  # reference labels use n-gram path only
    )
    out = (
        quality_filter_dataset(rd.from_arrow(table), cfg)
        .to_pandas()
        .sort_values("url", ignore_index=True)
    )

    det = LinguaDetector(load_dict_models(models_dir))
    ref_keep, ref_scrubbed = _reference_labels(
        table, det, cfg.max_perplexity, cfg.quality_drop_mask
    )
    import pandas as pd

    ref = (
        pd.DataFrame(
            {
                "url": table.column("url").to_pylist(),
                "ref_keep": ref_keep,
                "ref_scrubbed": ref_scrubbed,
            }
        )
        .sort_values("url", ignore_index=True)
    )

    tp = int((out["keep"] & ref["ref_keep"]).sum())
    fp = int((out["keep"] & ~ref["ref_keep"]).sum())
    fn = int((~out["keep"] & ref["ref_keep"]).sum())
    precision = tp / max(1, tp + fp)
    recall = tp / max(1, tp + fn)
    f1 = 2 * precision * recall / max(1e-9, precision + recall)
    assert f1 >= 0.99, f"keep/drop F1 {f1:.4f} (tp={tp} fp={fp} fn={fn})"

    # byte-identical scrubbed text per url
    mismatches = (out["text_scrubbed"] != ref["ref_scrubbed"]).sum()
    assert mismatches == 0
