"""Scale-out layer: mesh construction, shardings, bulk embedding.

First-class here, unlike the reference, whose only parallelism is host-side
(rayon preprocess threads, an RwLock'd shared session, and a manual
``duplicate()`` replica pattern — reference: src/vision.rs:128-132,
src/onnx.rs:9, src/clip.rs:69-73; SURVEY.md §2). The TPU-native analog:
data parallelism via batch-sharded pjit over a device mesh (replicated
weights), optional tensor parallelism over a 'model' axis for the largest
towers, with XLA inserting all collectives over ICI.
"""

from .mesh import get_mesh, replicate, select_platform, shard_batch
from .sharding import tp_param_specs
from .embed import ShardedVisionEmbedder, ShardedTextEmbedder
from .pipeline import EmbedPipeline
from .search import CorpusIndex

__all__ = [
    "get_mesh",
    "replicate",
    "select_platform",
    "shard_batch",
    "tp_param_specs",
    "ShardedVisionEmbedder",
    "ShardedTextEmbedder",
    "EmbedPipeline",
    "CorpusIndex",
]
