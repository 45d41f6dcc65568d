from visual_odom_tpu.frontend.featureset import FeatureState, empty_feature_state
from visual_odom_tpu.frontend.bucketing import detect_and_bucket
from visual_odom_tpu.frontend.matching import circular_match, CircularMatchResult

__all__ = [
    "FeatureState",
    "empty_feature_state",
    "detect_and_bucket",
    "circular_match",
    "CircularMatchResult",
]
