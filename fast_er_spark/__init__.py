"""fast_er_spark — a PySpark-native probabilistic record-linkage and
near-duplicate-detection engine with the capabilities of jacobmorrier/fast-er
(reference at /root/reference, studied for semantics only; architecture is
Spark-first: DataFrame/SQL + vectorized Arrow UDFs, no kernel ports).
"""

from .estimation import Estimation
from .evaluation import Evaluation
from .linkage import Comparison, Deduplication, Linkage

__version__ = "0.1.0"

__all__ = ["Comparison", "Deduplication", "Linkage", "Estimation", "Evaluation"]
