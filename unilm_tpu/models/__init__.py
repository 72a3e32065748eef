"""L4 model zoo: thin compositions of the shared core (SURVEY.md §7)."""
