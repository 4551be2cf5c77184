"""Source connectors: MQTT streaming (Python Data Source API), GTFS-RT
protobuf scrape, Pulsar admin REST scan/crawl."""
