"""Deterministic synthetic media table (images + audio).

Containers ALTERNATE between the RAW test container and a REAL
interchange format (24-bit BMP / 16-bit PCM WAV, both decodable with
zero external dependencies) so every pipeline over this table exercises
genuine format parsing, not just the test fixture.

Schema: media_id:int64, kind:string ('image'|'audio'), payload:binary,
meta_width:int32, meta_height:int32, meta_sample_rate:int32.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from tiny_lingua_ray.stages.multimodal import (
    encode_bmp,
    encode_raw_audio,
    encode_raw_image,
    encode_wav,
)


def make_media_table(n_rows: int = 64, seed: int = 42) -> pa.Table:
    ids, kinds, payloads = [], [], []
    widths, heights, rates = [], [], []
    for i in range(n_rows):
        rng = np.random.RandomState(seed + i)
        ids.append(i)
        if i % 2 == 0:
            h, w = 24 + (i % 5) * 8, 32 + (i % 3) * 16
            img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
            kinds.append("image")
            # alternate RAW container / real BMP (pixel-exact either way)
            payloads.append(
                encode_raw_image(img) if i % 4 == 0 else encode_bmp(img)
            )
            widths.append(w)
            heights.append(h)
            rates.append(0)
        else:
            rate = 8000
            n = rate // 2 + (i % 7) * 100
            # samples on the int16 grid: the WAV round-trip is then
            # exact, so RAW and WAV rows are feature-identical
            samples = (
                np.round(rng.standard_normal(n) * 0.1 * 32768.0)
                .clip(-32768, 32767) / 32768.0
            ).astype(np.float32)
            kinds.append("audio")
            payloads.append(
                encode_raw_audio(samples, rate)
                if i % 4 == 1
                else encode_wav(samples, rate)
            )
            widths.append(0)
            heights.append(0)
            rates.append(rate)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "meta_width": pa.array(widths, pa.int32()),
            "meta_height": pa.array(heights, pa.int32()),
            "meta_sample_rate": pa.array(rates, pa.int32()),
        }
    )


def make_video_table(n_rows: int = 16, seed: int = 7) -> pa.Table:
    """Deterministic synthetic video clips (RAW container)."""
    from tiny_lingua_ray.stages.multimodal import encode_raw_video

    ids, payloads, frames_meta = [], [], []
    for i in range(n_rows):
        rng = np.random.RandomState(seed + i)
        n = 8 + (i % 5) * 4
        clip = rng.randint(0, 256, size=(n, 16, 16, 3), dtype=np.uint8)
        ids.append(i)
        payloads.append(encode_raw_video(clip, fps=24))
        frames_meta.append(n)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(["video"] * n_rows, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "meta_frames": pa.array(frames_meta, pa.int32()),
        }
    )
