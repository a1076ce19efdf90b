"""Plans: partitioning/salting strategies and checkpointed resume."""
