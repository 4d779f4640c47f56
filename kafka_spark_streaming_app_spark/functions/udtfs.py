"""Python UDTFs (Spark 4 user-defined table functions).

The engine's production chunker is the codegen-native row-local
explode in operators/llmprep.py — THIS module exists to cover the
UDTF API surface with a slow-path twin whose equivalence is asserted
in tests/test_llmprep.py. UDTFs cross the Python boundary per row, so
they stay out of driver-facing queries (the repo-wide no-Python-in-
the-hot-path rule, session.py); legitimate uses are ops no Column
expression can express — external-library tokenizers, per-row
recursive parsers — where the Arrow-batched alternatives don't fit
the one-row-to-many-rows shape.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx: bigint, chunk_text: string, n_chunk_tokens: bigint")
class ChunkDocumentUDTF:
    """Slow-path twin of operators.llmprep.chunk_documents: identical
    normalization (lower, trim, collapse whitespace), identical chunk
    starts ``1, 1+stride, …`` with the final short chunk kept and a
    sub-chunk document yielding exactly one chunk."""

    def eval(self, text: str, chunk_tokens: int, overlap: int):
        if text is None:
            return
        stride = chunk_tokens - overlap
        toks = re.sub(r"\s+", " ", text.strip().lower()).split(" ")
        n = len(toks)
        for chunk_idx, start in enumerate(
            range(1, max(n - overlap, 1) + 1, stride)
        ):
            window = toks[start - 1 : start - 1 + chunk_tokens]
            yield chunk_idx, " ".join(window), len(window)


def register_udtfs(spark) -> None:
    """Register the UDTF surface for SQL (LATERAL) use."""
    spark.udtf.register("chunk_document", ChunkDocumentUDTF)
