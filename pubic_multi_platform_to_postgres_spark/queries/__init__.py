"""Query catalog package — importing this package registers all queries."""

from pubic_multi_platform_to_postgres_spark.queries import (  # noqa: F401
    analytics,
    elt,
    incremental,
    lifecycle,
    llmdata,
    relational,
    streamwin,
)
from pubic_multi_platform_to_postgres_spark.queries.registry import (  # noqa: F401
    REGISTRY,
    Query,
    load,
    query,
)
