"""PDF tool parity: text extraction with page-range selection (reference
pdf_read_tool.py:89-194; page-range grammar 20-88).

Spark-side plumbing is real: PDFs load distributed via the
``binaryFile`` source (path, length, content bytes), extraction runs as
an Arrow-batched mapInPandas over the binary column, and page-range
parsing is a pure, fully-tested function.  The pdf codec itself (pypdf)
is gated behind an import-try — absent in this container, the extraction
kernel raises NotImplementedError (or emits a deterministic fake for
pipeline testing, mirroring operators/multimodal.py).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def parse_page_range(spec: str | None, n_pages: int) -> list[int]:
    """'1-3,5,9-' → zero-based page indices, clamped to the document.

    Grammar (pdf_read_tool.py:20-88): comma-separated items; each item a
    1-based page, an inclusive 'a-b' span, 'a-' (to end) or '-b' (from
    start). None/'' → all pages. Out-of-range indices are clamped; an
    unparseable item raises ValueError.
    """
    if not spec:
        return list(range(n_pages))
    pages: list[int] = []
    for item in spec.split(","):
        item = item.strip()
        if not item:
            continue
        if "-" in item:
            lo_s, _, hi_s = item.partition("-")
            lo = int(lo_s) if lo_s.strip() else 1
            hi = int(hi_s) if hi_s.strip() else max(n_pages, lo)
        else:
            lo = hi = int(item)
        if lo < 1 or hi < lo:
            raise ValueError(f"bad page range item: {item!r}")
        if lo > n_pages:
            # whole item starts past the end ('9-' or '9-12' on a 4-page
            # doc): clamped to an empty selection, per the docstring
            continue
        for p in range(lo, min(hi, n_pages) + 1):
            idx = p - 1
            if idx not in pages:
                pages.append(idx)
    return pages


PDF_PAGES_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("page", T.IntegerType()),
        T.StructField("text", T.StringType()),
        T.StructField("n_pages", T.IntegerType()),
    ]
)


def _extract_kernel(content: bytes, pages_spec: str | None, mode: str) -> list[tuple[int, str, int]]:
    """(page_idx, text, n_pages) per selected page.

    mode='real': pypdf when installed, else the stdlib codec
    (sources/pdf_codec.py — Flate + classic text operators; encrypted /
    xref-stream files yield empty page text, documented there).
    mode='fake': deterministic pseudo-pages for pipeline tests.
    """
    try:
        import pypdf  # noqa: F401
        has_pypdf = True
    except ImportError:
        has_pypdf = False
    if has_pypdf and mode == "real":  # pragma: no cover - codec not in env
        import io

        reader = pypdf.PdfReader(io.BytesIO(content))
        n = len(reader.pages)
        return [
            (i, reader.pages[i].extract_text() or "", n)
            for i in parse_page_range(pages_spec, n)
        ]
    if mode == "real":
        from . import pdf_codec

        pages = pdf_codec.extract_pages(content)
        n = len(pages)
        return [(i, pages[i], n) for i in parse_page_range(pages_spec, n)]
    if mode == "raise":
        raise NotImplementedError(
            "mode='raise' forces the codec-missing path; use mode='real' "
            "(pypdf or the stdlib codec) or mode='fake'."
        )
    # deterministic fake: 4 pseudo-pages derived from the content hash
    digest = hashlib.sha256(content).hexdigest()
    n = 4
    return [
        (i, f"fake page {i + 1} of {digest[:12]}", n)
        for i in parse_page_range(pages_spec, n)
    ]


def read_pdfs(
    spark: SparkSession,
    path_glob: str,
    pages: str | None = None,
    mode: str = "real",
) -> DataFrame:
    """Distributed PDF → per-page text rows.

    ``binaryFile`` source scans the files in parallel; extraction is an
    Arrow-batched mapInPandas (column-pruned to path+content before the
    Python stage — the bytes column dominates I/O at scale).
    """
    binary = spark.read.format("binaryFile").load(path_glob).select("path", "content")

    def extract(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list[Any]] = {"path": [], "page": [], "text": [], "n_pages": []}
            for p, content in zip(pdf["path"], pdf["content"]):
                for idx, text, n in _extract_kernel(bytes(content), pages, mode):
                    out["path"].append(p)
                    out["page"].append(idx + 1)
                    out["text"].append(text)
                    out["n_pages"].append(n)
            yield pd.DataFrame(out)

    return binary.mapInPandas(extract, schema=PDF_PAGES_SCHEMA)
