from .masks import get_random_mask
from .sceneflow import (SceneFlowSample, load_sceneflow_pickle,
                        prepare_straag_sample)
from .buckets import (ASPECT_RATIO_512, closest_bucket, ResumableSampler,
                      AspectRatioBatchSampler)

__all__ = [
    "get_random_mask", "SceneFlowSample", "load_sceneflow_pickle",
    "prepare_straag_sample", "ASPECT_RATIO_512", "closest_bucket",
    "ResumableSampler", "AspectRatioBatchSampler",
]
