from ska_src_maltopuft_etl_spark.cli import main

raise SystemExit(main())
