from montecarlopagerank_spark.streaming.edge_stream import (
    run_edge_stream,
    stream_typed_edges,
)

__all__ = ["run_edge_stream", "stream_typed_edges"]
