"""Reusable DataFrame operators: quality profiling, dedup, similarity,
text analysis, multimodal plumbing. All DataFrame-first; Python appears
only inside Arrow-batched pandas UDFs / mapInPandas."""
