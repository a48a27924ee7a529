"""sgdnet_spark — PySpark-native elastic-net GLM engine + LLM-data-pipeline operators.

A from-scratch re-expression of the capabilities of jolars/sgdnet
(R/sgdnet.R, src/saga-*.h) on Apache Spark: the sequential SAGA solver is
replaced by distributed sufficient-statistic / IRLS solvers (see SURVEY.md §3),
and the surrounding API (predict / score / deviance / cv) mirrors the
reference's glmnet-compatible surface.
"""

import os as _os

# Cap the driver-side BLAS pool BEFORE numpy first loads it: the GLM
# solvers' numpy kernels are small-matrix ops (p ~ 5-2000 columns) where
# a 32-thread BLAS burns ~10x the CPU of a 4-thread one for identical
# wall time (measured: 36-61s vs 5-6s CPU per binomial path fit at
# sf0.1). Executor-side python workers are unaffected — pyspark already
# pins their OMP_NUM_THREADS to the task's cores. setdefault only: an
# explicit user/env setting always wins.
for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    _os.environ.setdefault(_v, "4")

from sgdnet_spark.glm.sgdnet import sgdnet, SgdnetFit
from sgdnet_spark.glm.cv import cv_sgdnet, CvSgdnetFit

__all__ = ["sgdnet", "SgdnetFit", "cv_sgdnet", "CvSgdnetFit"]
__version__ = "0.1.0"
