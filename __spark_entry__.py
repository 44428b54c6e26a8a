"""Driver entry contract — thin facade over the hbi_entry package.

The real content lives in hbi_entry/ (core helpers, per-family query
builders, oracle SQL, registry); this module keeps the driver's module
path and attribute surface unchanged: entry(spark), queries(),
oracle_sql(), plus the session caches and fixtures scripts reach into
(_CACHE, _corpus, _index, ...).  Split in round 5 — the single file had
grown to 10.8k lines (judge round-4 item #5)."""
import os as _os
import sys as _sys

# robust under file-path loading too (spec_from_file_location): the
# package lives next to this file, which may not be on sys.path then
_here = _os.path.dirname(_os.path.abspath(__file__))
if _here not in _sys.path:
    _sys.path.insert(0, _here)

from hbi_entry.registry import *  # noqa: E402,F401,F403
from hbi_entry.registry import entry, oracle_sql, queries  # noqa: E402,F401
