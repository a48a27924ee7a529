from sgdnet_spark.glm.sgdnet import sgdnet, SgdnetFit
from sgdnet_spark.glm.score import score, score_np
from sgdnet_spark.glm.cv import cv_sgdnet, CvSgdnetFit

__all__ = ["sgdnet", "SgdnetFit", "score", "score_np", "cv_sgdnet", "CvSgdnetFit"]
