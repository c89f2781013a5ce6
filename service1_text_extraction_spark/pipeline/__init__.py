"""The Spark extraction job: read -> salt -> extract UDF -> order -> sink."""

from .extract import (  # noqa: F401
    RESULT_FIELDS,
    assemble_documents,
    extraction_metrics,
    run_extraction,
    with_bucket,
)
from .checkpoint import (  # noqa: F401
    MARKER_SCHEMA,
    compute_markers,
    filter_pending,
    run_with_resume,
)
