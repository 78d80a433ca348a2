from sklearn_raster_spark.datasets.synthetic import (
    generate_fractal_noise,
    synthesize_feature_frame,
)

__all__ = ["generate_fractal_noise", "synthesize_feature_frame"]
