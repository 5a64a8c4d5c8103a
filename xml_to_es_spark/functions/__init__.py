from xml_to_es_spark.functions.analysis import tokens_col, doc_len_col  # noqa: F401
