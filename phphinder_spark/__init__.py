"""phphinder_spark — a PySpark-native inverted-index + BM25 search engine
with the query and data-processing capabilities of eliasfernandez/phphinder,
re-expressed Spark-first (DataFrame/SQL plans, Arrow-vectorized UDFs only).
"""

__version__ = "0.2.0"

from phphinder_spark.corpus import generate_code_corpus, load_text_corpus
from phphinder_spark.engine import RequiredFieldError, Result, SparkSearchEngine
from phphinder_spark.index.builder import (
    InvertedIndex,
    assign_doc_ids,
    assign_doc_ids_clustered,
    build_index,
)
from phphinder_spark.index.segments import (
    merge_segment_stores,
    segment_bm25_topk,
    segment_bm25_topk_blockmax,
)
from phphinder_spark.schema import SearchSchema, code_schema

__all__ = [
    "InvertedIndex",
    "RequiredFieldError",
    "Result",
    "SearchSchema",
    "SparkSearchEngine",
    "assign_doc_ids",
    "assign_doc_ids_clustered",
    "build_index",
    "code_schema",
    "generate_code_corpus",
    "load_text_corpus",
    "merge_segment_stores",
    "segment_bm25_topk",
    "segment_bm25_topk_blockmax",
]
