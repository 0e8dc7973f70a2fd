from hbase_rdf_spark.sources.synthetic import (  # noqa: F401
    TRANSCRIPT_SCHEMA,
    build_gazetteer,
    full_alias_map,
    transcripts_df,
    transcripts_pdf,
)
