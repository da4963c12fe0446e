"""Model-inference seams: embedding encoder (E1/E2) + cross-encoder rerank (E3).

The reference calls sentence-transformers in-process
(`pipeline/encode_assets.py:24-34` → all-MiniLM-L6-v2, normalized;
`query.py:57-61` → ms-marco-MiniLM-L-6-v2 cross-encoder).  Real models are
heavyweight, non-deterministic across platforms, and absent from this
container — so the engine defines a pluggable seam:

- ``HashEncoder``: deterministic md5-seeded projection text → unit vector.
  The default for tests/oracles.  Same algorithm available three ways:
  pure-Python (oracle), pandas UDF (distributed), and — for the rerank
  stub — a *native Catalyst expression* that DuckDB can reproduce in SQL.
- ``SentenceTransformerEncoder``: the production path, loaded lazily inside
  the pandas-UDF iterator (one model per executor process, reused across
  Arrow batches — the canonical Spark batch-inference pattern).  Raises
  cleanly when sentence-transformers isn't installed.

Scale note: both paths are ``pandas_udf`` (iterator form) — Arrow-batched,
model loaded once per Python worker, embarrassingly parallel over a 100 TB
corpus; no state, no shuffle.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


# ---------------------------------------------------------------------------
# Deterministic hash encoder (test/oracle stub for E1/E2)
# ---------------------------------------------------------------------------
class HashEncoder:
    """text → unit vector of dim ``dim``; deterministic, platform-independent.

    Component i = int(md5(f"{text}|{i}")[:8 hex], 16) scaled to [-1, 1),
    then L2-normalized.  Cheap, seedable, reproducible in any engine.
    """

    def __init__(self, dim: int = 64, seed: str = "vss"):
        self.dim = dim
        self.seed = seed

    def encode_one(self, text: str) -> list[float]:
        raw = [
            int(hashlib.md5(f"{self.seed}|{text}|{i}".encode()).hexdigest()[:8], 16)
            / float(1 << 31)
            - 1.0
            for i in range(self.dim)
        ]
        norm = math.sqrt(sum(x * x for x in raw)) or 1.0
        return [x / norm for x in raw]

    def udf(self):
        """Arrow-batched pandas UDF: Series[str] -> Series[list[float]]."""
        dim, seed = self.dim, self.seed

        @F.pandas_udf(T.ArrayType(T.DoubleType()))
        def encode(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
            enc = HashEncoder(dim, seed)
            for s in batches:
                yield pd.Series([enc.encode_one(t if t is not None else "") for t in s])

        return encode


class SentenceTransformerEncoder:
    """Production encoder (reference `pipeline/encode_assets.py:24-34`).

    Model name + normalize flag mirror the reference; the model is loaded
    lazily once per executor Python worker inside the iterator UDF.
    """

    def __init__(self, model_name: str = "all-MiniLM-L6-v2", dim: int = 384):
        self.model_name = model_name
        self.dim = dim

    def udf(self):
        model_name = self.model_name
        try:
            import sentence_transformers  # noqa: F401
        except ImportError as e:  # pragma: no cover - not installed here
            raise NotImplementedError(
                "sentence-transformers not installed in this environment; "
                "use HashEncoder for deterministic tests"
            ) from e

        @F.pandas_udf(T.ArrayType(T.FloatType()))
        def encode(batches: Iterator["pd.Series"]) -> Iterator["pd.Series"]:  # noqa: F821
            import pandas as pd
            from sentence_transformers import SentenceTransformer

            model = SentenceTransformer(model_name)  # once per worker
            for s in batches:
                vecs = model.encode(list(s.fillna("")), normalize_embeddings=True)
                yield pd.Series([list(v) for v in vecs])

        return encode


# ---------------------------------------------------------------------------
# Rerank scoring (E3): deterministic stub as a NATIVE expression
# ---------------------------------------------------------------------------
def hash_rerank_score(query: Column | str, text: Column | str) -> Column:
    """Deterministic stand-in for the cross-encoder logit, in [-4, 4).

    logit = (hex(md5(query||'|'||text)[:8]) % 100000) / 100000 * 8 - 4

    Pure Catalyst (md5/conv/arithmetic) so it is (a) JVM-side at scale and
    (b) exactly reproducible in the DuckDB oracle:
    ``(('0x'||substr(md5(q||'|'||t),1,8))::BIGINT % 100000)/100000.0*8-4``.
    """
    q = F.col(query) if isinstance(query, str) else query
    t = F.col(text) if isinstance(text, str) else text
    h = F.conv(F.substring(F.md5(F.concat_ws("|", q, t)), 1, 8), 16, 10).cast("long")
    return (h % 100000).cast("double") / 100000.0 * 8.0 - 4.0


def cross_encoder_rerank_udf(model_name: str = "cross-encoder/ms-marco-MiniLM-L-6-v2"):
    """Production rerank (reference `query.py:12,57-61`): pandas UDF scoring
    (query, text) pairs with a cross-encoder, model loaded once per worker."""
    try:
        import sentence_transformers  # noqa: F401
    except ImportError as e:  # pragma: no cover - not installed here
        raise NotImplementedError(
            "sentence-transformers not installed; use hash_rerank_score"
        ) from e

    @F.pandas_udf(T.DoubleType())
    def rerank(batches: Iterator[tuple["pd.Series", "pd.Series"]]) -> Iterator["pd.Series"]:  # noqa: F821
        import pandas as pd
        from sentence_transformers import CrossEncoder

        model = CrossEncoder(model_name)
        for q, t in batches:
            scores = model.predict(list(zip(q.fillna(""), t.fillna(""))))
            yield pd.Series([float(x) for x in scores])

    return rerank
