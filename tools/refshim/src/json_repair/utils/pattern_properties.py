from engine.repair.schema import match_patterns as match_pattern_properties  # noqa: F401
