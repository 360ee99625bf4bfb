"""HTML -> text extraction (stateless map_batches stage).

North-rule invariant: byte-identical extracted text per url (the synthetic
corpus wraps the text in a fixed HTML template, so extraction must recover
it exactly).  The extractor is a small deterministic parser: it takes the
content of the first <p>...</p> inside <body>, unescapes nothing (the
generator does not escape), and decodes UTF-8.

Drops the wide ``html`` binary column after extraction (SURVEY.md §7.4
hard-part 9: keep Arrow blocks small downstream).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_OPEN = b"<p>"
_CLOSE = b"</p>"


def extract_text(html: bytes | None) -> str:
    if html is None:
        return ""
    i = html.find(_OPEN)
    if i < 0:
        return ""
    j = html.rfind(_CLOSE)
    if j < 0 or j < i:
        return ""
    return html[i + len(_OPEN) : j].decode("utf-8", errors="replace")


def extract_batch(
    batch: pa.Table,
    html_column: str = "html",
    out_column: str = "extracted_text",
    drop_html: bool = True,
) -> pa.Table:
    html = batch.column(html_column).to_pylist()
    out = pa.array([extract_text(h) for h in html], pa.string())
    batch = batch.append_column(out_column, out)
    if drop_html:
        batch = batch.drop_columns([html_column])
    return batch


def verify_extraction(batch: pa.Table) -> pa.Table:
    """Appends ``extract_ok`` — extracted_text byte-equals the text column."""
    ok = pc.equal(batch.column("extracted_text"), batch.column("text"))
    return batch.append_column("extract_ok", ok)
