from yadf_spark.sources.corpus import filesystem_corpus, table_corpus, default_paths

__all__ = ["filesystem_corpus", "table_corpus", "default_paths"]
