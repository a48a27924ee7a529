"""sgdnet_spark — PySpark-native elastic-net GLM engine + LLM-data-pipeline operators.

A from-scratch re-expression of the capabilities of jolars/sgdnet
(R/sgdnet.R, src/saga-*.h) on Apache Spark: the sequential SAGA solver is
replaced by distributed sufficient-statistic / IRLS solvers (see SURVEY.md §3),
and the surrounding API (predict / score / deviance / cv) mirrors the
reference's glmnet-compatible surface.
"""

from sgdnet_spark.glm.sgdnet import sgdnet, SgdnetFit
from sgdnet_spark.glm.cv import cv_sgdnet, CvSgdnetFit

__all__ = ["sgdnet", "SgdnetFit", "cv_sgdnet", "CvSgdnetFit"]
__version__ = "0.1.0"
