from pgloader_spark.cli import main

raise SystemExit(main())
