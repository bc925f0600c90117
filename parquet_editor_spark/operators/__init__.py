"""Relational + editor operators, all lowered to stock Spark SQL ops."""
