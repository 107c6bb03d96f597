"""``python -m tric_spark`` — the bin/tric-compatible entry point."""

from tric_spark.cli import main

if __name__ == "__main__":
    main()
