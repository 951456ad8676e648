"""OTTL-subset function surface: expression compiler, converters, editors."""
