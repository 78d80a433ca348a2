from sklearn_raster_spark.estimators.numpy_models import (
    FixedGaussianNB,
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
    "FixedLinearModel",
    "FixedPCA",
    "GaussianNBNP",
    "KMeansNP",
    "KNeighborsRegressorNP",
    "LinearRegressionNP",
    "PCANP",
    "StandardScalerNP",
]
