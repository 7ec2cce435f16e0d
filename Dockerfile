# Container recipe for the graft engine — deployment-packaging parity
# with the reference's Dockerfile (python:3.9-buster + msodbcsql17 +
# poetry install + non-root user; /root/reference/Dockerfile:1-37).
# The Spark translation: the official Apache Spark runtime image
# already carries the JVM + Spark distribution, the engine rides in as
# one thin jar (`sbt package` — the library depends on nothing beyond
# Spark itself), and the SQL Server connectivity that needed a native
# ODBC driver in the reference is a single pure-JVM JDBC jar.
#
# Build:  sbt package && docker build -t graft .
# Run:    docker run --env-file graft.env graft   (see bin/graft-submit.sh)
#
# NOTE: not buildable in the development sandbox (zero egress — no
# base-image pull, no Maven Central fetch); the recipe is the
# documented deployment contract, exercised the same way the
# reference's Dockerfile is: by the production environment.

# The official Apache Spark image for the engine's build matrix
# (Spark 4.1.x, Scala 2.13, Java 17). Pin the exact digest in
# production.
FROM apache/spark:4.1.2-scala2.13-java17-ubuntu

USER root

# SQL Server connectivity: the reference needed the msodbcsql17 native
# driver + unixodbc (Dockerfile:10-16); on the JVM it is one JDBC jar
# from Maven Central, picked up by Spark's MsSqlServerDialect
# automatically for jdbc:sqlserver: URLs (pinned offline in
# MsSqlDialectSpec).
ARG MSSQL_JDBC_VERSION=12.8.1.jre11
RUN curl -fsSL -o "$SPARK_HOME/jars/mssql-jdbc-${MSSQL_JDBC_VERSION}.jar" \
  "https://repo1.maven.org/maven2/com/microsoft/sqlserver/mssql-jdbc/${MSSQL_JDBC_VERSION}/mssql-jdbc-${MSSQL_JDBC_VERSION}.jar"

# The engine jar (thin — Spark provides every dependency) and the
# env-var submit wrapper (the reference's SANEF_Uploader.sh shape).
# EXACT artifact name, not a glob: `COPY *.jar <file>` silently depends
# on a clean target dir — a stale jar from a previous version bump
# beside the fresh `sbt package` output fails the build (or copies the
# wrong jar). The name is pinned by build.sbt's name + version.
COPY target/scala-2.13/sanefelectiondashboardetlspark_2.13-0.1.0.jar /app/graft.jar
COPY bin/graft-submit.sh /app/graft-submit.sh

# Non-root runtime user, as the reference (Dockerfile:29-35). The
# spark image ships a `spark` user; reuse it instead of minting one.
RUN chown -R spark:spark /app
USER spark
WORKDIR /app

ENTRYPOINT ["/app/graft-submit.sh"]
