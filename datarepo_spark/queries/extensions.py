"""LLM-pipeline extension queries (dedup, similarity, text, multimodal).

Populated by datarepo_spark.functions.* modules registering into the shared
REGISTRY. Importing this module pulls them all in.
"""

# Extension modules register queries on import; they are added as they are
# implemented. (Kept separate from registry.py so the core relational
# surface and the LLM-pipeline surface stay independently readable.)
