from sgdnet_spark.glm.sgdnet import sgdnet, SgdnetFit
from sgdnet_spark.glm.score import score, score_np
from sgdnet_spark.glm.cv import cv_sgdnet, CvSgdnetFit
from sgdnet_spark.glm.sparse import sgdnet_sparse

__all__ = [
    "sgdnet", "SgdnetFit", "score", "score_np", "cv_sgdnet", "CvSgdnetFit",
    "sgdnet_sparse",
]
