"""Pure per-document kernels. No Spark imports allowed in this package —
these functions are shared verbatim between the single-process oracle and
the distributed Arrow-batched stages (SURVEY.md §7.1 step 3)."""
