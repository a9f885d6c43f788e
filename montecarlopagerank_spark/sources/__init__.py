from montecarlopagerank_spark.sources.transcripts import (  # noqa: F401
    read_transcripts,
    transcripts_from_events,
    write_transcripts,
)
from montecarlopagerank_spark.sources.adjacency_text import (  # noqa: F401
    read_adjacency_text,
    write_adjacency_text,
)
