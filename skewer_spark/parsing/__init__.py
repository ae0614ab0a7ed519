from skewer_spark.parsing.syslog import (  # noqa: F401
    PARSED_SCHEMA,
    parse_batch,
    parse_transcripts,
)
