from pubic_multi_platform_to_postgres_spark.cli import main

raise SystemExit(main())
