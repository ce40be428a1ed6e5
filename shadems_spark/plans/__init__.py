"""End-to-end query plans (the reference's CLI orchestration layer)."""
