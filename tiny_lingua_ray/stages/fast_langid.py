"""FastLangId — fastText-style fallback stage (actor pool).

Fallback semantics (north rule: "fastText langid fallback"): rows the
n-gram detector left ``unknown`` (or resolved with a margin below
``min_margin``) are re-scored by the hashed-ngram linear classifier; its
prediction is taken when its softmax probability >= ``min_prob``.

Appends: ``lang_final`` (string), ``ft_prob`` (float64, NaN when the
fallback didn't run for that row).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from tiny_lingua_ray.models.fast_text import ensure_fasttext_model, predict


class FastLangId:
    def __init__(
        self,
        model_ref=None,
        min_prob: float = 0.5,
        min_margin: float = 0.05,
        text_column: str = "text",
        lang_column: str = "pred_lang",
        margin_column: str = "lang_margin",
    ):
        if model_ref is not None:
            import ray

            self.model = ray.get(model_ref)
        else:
            self.model = ensure_fasttext_model()
        self.min_prob = min_prob
        self.min_margin = min_margin
        self.text_column = text_column
        self.lang_column = lang_column
        self.margin_column = margin_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_column).to_pylist()
        langs = batch.column(self.lang_column).to_pylist()
        margins = batch.column(self.margin_column).to_numpy(
            zero_copy_only=False
        )
        R = len(texts)
        final = list(langs)
        probs = np.full(R, np.nan)

        todo = [
            r
            for r in range(R)
            if (texts[r] or "").strip()
            and (
                langs[r] == "unknown"
                or (
                    not np.isnan(margins[r])
                    and margins[r] < self.min_margin
                )
            )
        ]
        if todo:
            preds, ps = predict(self.model, [texts[r] or "" for r in todo])
            for k, r in enumerate(todo):
                probs[r] = ps[k]
                if ps[k] >= self.min_prob:
                    final[r] = preds[k]
        return batch.append_column(
            "lang_final", pa.array(final, pa.string())
        ).append_column("ft_prob", pa.array(probs))
