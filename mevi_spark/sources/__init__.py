from mevi_spark.sources.io import (
    load_table,
    load_tables,
    read_corpus_tsv,
    read_queries_dev_tsv,
    read_queries_train_tsv,
    read_qrels_tsv,
    read_run_tsv,
    write_run_tsv,
)

__all__ = [
    "load_table",
    "load_tables",
    "read_corpus_tsv",
    "read_queries_dev_tsv",
    "read_queries_train_tsv",
    "read_qrels_tsv",
    "read_run_tsv",
    "write_run_tsv",
]
