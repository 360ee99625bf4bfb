"""N-gram language-model artifacts.

The reference loads per-language binary model files generated at build time
from upstream Lingua JSON models (lookup/UniBiTrigramLookup.kt:104-130,
buildSrc/.../GenerateLanguageModelsTask.kt:158-197).  Those JSON artifacts
are NOT present in this environment (no network), so we train models with
the same public formula (relative frequency = count(ngram) /
count((n-1)-prefix), unigrams count/total, float32 division) from the
reference's own accuracy corpus.  Since round 5 the two accuracy modes
train their artifacts on different split mixtures (the reference loads
per-mode model artifacts too) — see train.DEFAULT_TRAIN_SPLITS /
LOW_MODE_TRAIN_SPLITS for the measured conformance rationale.

LOUD GAP NOTE: our frequencies are therefore not bit-identical to upstream
Lingua's; all golden/label tests pin OUR deterministic models instead
(SURVEY.md §7.1 step 1 fallback).
"""
