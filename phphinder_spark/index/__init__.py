from phphinder_spark.index.builder import InvertedIndex, build_index

__all__ = ["InvertedIndex", "build_index"]
