from asvsp_spark.cli import main

raise SystemExit(main())
