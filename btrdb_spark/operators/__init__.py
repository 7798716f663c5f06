"""The BTrDB query surface as Spark DataFrame plans (SURVEY.md §2)."""
