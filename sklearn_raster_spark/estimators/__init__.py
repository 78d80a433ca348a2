from sklearn_raster_spark.estimators.numpy_models import (
    FixedLinearModel,
    GaussianNBNP,
    KMeansNP,
    KNeighborsRegressorNP,
    LinearRegressionNP,
    PCANP,
    StandardScalerNP,
)

__all__ = [
    "FixedLinearModel",
    "GaussianNBNP",
    "KMeansNP",
    "KNeighborsRegressorNP",
    "LinearRegressionNP",
    "PCANP",
    "StandardScalerNP",
]
