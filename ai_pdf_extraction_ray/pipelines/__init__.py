"""End-to-end Dataset pipelines and relational queries."""
