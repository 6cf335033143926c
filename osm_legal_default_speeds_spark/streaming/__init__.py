from osm_legal_default_speeds_spark.streaming.event_rollup import (  # noqa: F401
    sessionize,
    streaming_event_rollup,
    streaming_speed_inference,
)
