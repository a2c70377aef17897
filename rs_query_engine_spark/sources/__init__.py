from rs_query_engine_spark.sources.corpus import TABLES, load_corpus, register_corpus

__all__ = ["TABLES", "load_corpus", "register_corpus"]
