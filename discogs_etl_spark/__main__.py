from discogs_etl_spark.cli import main

raise SystemExit(main())
