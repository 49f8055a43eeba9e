"""Pipeline compositions (SURVEY §3 entry points re-expressed as lazy
DataFrame DAGs)."""
