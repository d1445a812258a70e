from kompactor_spark.cli import main

raise SystemExit(main())
