from earthmover_spark.cli import main

raise SystemExit(main())
