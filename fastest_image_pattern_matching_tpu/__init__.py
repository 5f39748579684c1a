"""fastest_image_pattern_matching_tpu — a TPU-native (JAX/XLA/Pallas)
rotation-invariant template-matching framework.

Same capability surface as the reference C++ tool
(lrm2017/Fastest_Image_Pattern_Matching): image-pyramid coarse-to-fine
normalized cross-correlation with rotation search, subpixel (x, y, theta)
refinement, multi-target greedy peak extraction, rotated-rect NMS, plus an
ORB feature-matching secondary path — redesigned TPU-first: batched MXU
correlation, vmapped warps, on-device reductions, mesh sharding.
"""

from .config import MatchConfig
from .types import LearnedPattern, MatchResult
from .models.template_matcher import (TemplateMatcher, learn_pattern, match,
                                      match_arrays, match_candidates,
                                      match_template)
from .models.batch import (BatchMatcher, match_many, match_many_arrays,
                           match_patterns)
from .aot import AotMatcher, export_match_pack

__version__ = "0.3.0"

__all__ = [
    "MatchConfig", "LearnedPattern", "MatchResult",
    "TemplateMatcher", "learn_pattern", "match", "match_arrays",
    "match_candidates", "match_template",
    "BatchMatcher", "match_many", "match_many_arrays", "match_patterns",
    "AotMatcher", "export_match_pack",
]
