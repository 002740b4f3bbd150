from .feed import first_position, latest_position, read_feed, read_feed_stream, write_feed_slices
from .flat_message import (
    decode_flat_message,
    encode_flat_message_expr,
    export_flat_messages,
    export_flat_messages_to_dir,
)
from .mq_partition import (
    MQRoutingConfig,
    assign_mq_routing,
    mq_partition_expr,
    mq_topic_expr,
    parse_mq_properties,
)

__all__ = [
    "MQRoutingConfig",
    "assign_mq_routing",
    "mq_partition_expr",
    "mq_topic_expr",
    "parse_mq_properties",
    "read_feed",
    "read_feed_stream",
    "write_feed_slices",
    "first_position",
    "latest_position",
    "decode_flat_message",
    "encode_flat_message_expr",
    "export_flat_messages",
    "export_flat_messages_to_dir",
]
