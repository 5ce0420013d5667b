"""Print the registry's generated counts for SURVEY.md Part C — run me
instead of hand-editing the numbers:

    python tools/registry_counts.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aind_data_transformation_spark.queries import registry

q, o = registry()
no_oracle = sorted(set(q) - set(o))
print(f"keys_total: {len(q)}")
print(f"oracle_backed: {len(o)}")
print(f"rows_only ({len(no_oracle)}): {' '.join(no_oracle)}")
