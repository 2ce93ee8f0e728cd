from kaj_query_engine_spark.sources.readers import (
    convert_text_table,
    read_table,
)
from kaj_query_engine_spark.sources.sink import write_result_tsv

__all__ = ["convert_text_table", "read_table", "write_result_tsv"]
