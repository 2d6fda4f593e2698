from phphinder_spark.streaming.incremental import incremental_index_stream

__all__ = ["incremental_index_stream"]
