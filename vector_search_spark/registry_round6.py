"""Round-6 registry additions — now a COMPATIBILITY SHIM.

The ~30 queries this module accumulated (graph analytics, time-series
diagnostics, statistical tests, in-engine model fits, retrieval operators)
were moved VERBATIM into domain modules in the round-6 reorg
(VERDICT r5 #6):

- `registry_graph`    — dup-graph / random-walk algorithms (BFS hops,
  modularity, double-sweep diameter, personalized PageRank, Markov
  hitting times, TextRank).
- `registry_stats`    — statistical inference & experimentation (robust
  centers, A/B monitors, rank/variance/ECDF tests, survival, CUPED,
  isotonic calibration, k-anonymity).
- `registry_mlfit`    — in-engine model fits & validation (logistic GD,
  kNN LOO, decision trees, bagging stability, conformal intervals).
- `registry_forecast` — smoothing / seasonal forecasting (ACF, seasonal
  decomposition, SES, Brown, Holt–Winters dow state).
- `registry_search`   — retrieval additions (MMR diversification,
  Rocchio PRF) beside BM25/hybrid.

Query names and oracle texts are the stable contract and are unchanged;
this shim re-exports the tunable constants the test suite imports so
`from vector_search_spark.registry_round6 import X` keeps working.
"""

from __future__ import annotations

from .registry_forecast import SES_MAX_E  # noqa: F401
from .registry_graph import (  # noqa: F401
    BFS_ROUNDS,
    DIAM_ROUNDS,
    HIT_ROUNDS,
    PPR_ITER,
    TEXTRANK_MIN_DF,
    TEXTRANK_ROUNDS,
    TEXTRANK_TOPK,
    _HIT_SCALE,
)
from .registry_forecast import ACF_MAX_LAG  # noqa: F401
from .registry_mlfit import (  # noqa: F401
    BAG_B,
    CONF_ALPHA_NUM,
    LOGREG_ROUNDS,
    LOO_K,
    LOO_MOD,
)
from .registry_search import MMR_CAND, MMR_PICKS, PRF_FB, PRF_TOPK  # noqa: F401
from .registry_stats import (  # noqa: F401
    CUPED_PRE_DAYS,
    KANON_K,
    SPRT_THRESH_MICRO,
    TRIM_DIV,
)
