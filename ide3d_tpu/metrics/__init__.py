from .metric_main import register_metric, calc_metric, list_metrics
from .features import FeatureExtractor, pixel_features
