from sklearn_raster_spark.estimators.numpy_models import (
    FixedGaussianNB,
    FixedKNeighbors,
    FixedLinearModel,
    FixedPCA,
    GaussianNBNP,
    KMeansNP,
    KNeighborsRegressorNP,
    LinearRegressionNP,
    PCANP,
    StandardScalerNP,
)

__all__ = [
    "FixedGaussianNB",
    "FixedKNeighbors",
    "FixedLinearModel",
    "FixedPCA",
    "GaussianNBNP",
    "KMeansNP",
    "KNeighborsRegressorNP",
    "LinearRegressionNP",
    "PCANP",
    "StandardScalerNP",
]
