"""LLM-training-data pipeline operators (engine extensions beyond the
reference surface, SURVEY.md §7.2 step 10): deduplication, similarity
search, text analysis, multimodal columns.

Every operator here is designed for 100 TB scale: no driver-side
collects, no cross joins except an explicitly-broadcast small side,
all hot paths in native Column expressions (JVM codegen) or Arrow
pandas UDFs.
"""

from earthmover_spark.llm import (  # noqa: F401
    chat,
    curation,
    dedup,
    embeddings,
    multimodal,
    preference,
    selection,
    similarity,
    textstats,
)
