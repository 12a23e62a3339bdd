"""CLI entry points (argparse; ref: SURVEY.md §1 L6)."""
