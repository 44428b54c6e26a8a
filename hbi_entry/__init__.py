"""Split driver-entry package — see registry.py; the module-path
contract lives in __spark_entry__.py at the repo root."""
