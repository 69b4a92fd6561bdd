"""documentindex_spark — a PySpark-native full-text index + BM25
retrieval engine, built from scratch with the query capabilities of
Jason-AI-lab/DocumentIndex (see SURVEY.md).

Architecture: DataFrame/SQL logical plans optimized by Catalyst;
vectorized Arrow/pandas UDFs only for posting-list codec and BMW
scoring; explicit salted repartitioning for hot-term skew; per-
partition lineage manifests for resumable builds.
"""

from .constants import BM25_B, BM25_K1, BLOCK_SIZE, TOKEN_SPLIT_RE  # noqa: F401
from .session import get_spark  # noqa: F401

__version__ = "0.1.0"
