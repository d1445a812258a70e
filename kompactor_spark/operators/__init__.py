"""Engine operators that Spark lacks as built-ins, expressed as
compositions of DataFrame primitives (SURVEY §2.B custom-operator
policy: composition first, pandas-UDF second, mapPartitions last)."""
