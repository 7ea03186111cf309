from hatchery_spark.cli import main

raise SystemExit(main())
