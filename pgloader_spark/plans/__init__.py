"""Plan layer: LoadCommand -> Spark execution."""
