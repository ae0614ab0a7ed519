from skewer_spark.routing.rules import (  # noqa: F401
    DEFAULT_RULES,
    RouteRule,
    STATUS_DROPPED_EXPR,
    STATUS_REJECTED_EXPR,
    TOPIC_VALID_RE,
    route_fanout,
    with_route_status,
)
