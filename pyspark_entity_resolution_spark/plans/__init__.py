"""Query plans: the driver-facing operator-inventory queries with DuckDB
oracle SQL, plus headline benchmark queries."""
