from icl.data.embeddings import EmbeddingStore
from icl.data.buckets import Bucketizer, BucketSpec

__all__ = ["EmbeddingStore", "Bucketizer", "BucketSpec"]
