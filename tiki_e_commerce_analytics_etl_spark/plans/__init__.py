"""End-to-end query plans (flagship queries of the engine)."""
