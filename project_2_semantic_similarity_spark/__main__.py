from project_2_semantic_similarity_spark.engine import main

raise SystemExit(main())
