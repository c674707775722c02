package sparkgraft;

import java.io.IOException;
import java.net.URI;
import org.apache.hadoop.conf.Configuration;
import org.apache.hadoop.fs.RawLocalFileSystem;

/**
 * Test-only Hadoop FileSystem for the s3mock:// scheme: behaves like an
 * object-store URI (scheme + bucket authority + double-slash root) for
 * all path arithmetic, while backing reads/writes with the local
 * filesystem (the authority is ignored; the key space is the path).
 * The commit-log plane does NOT go through this class - it uses the
 * Python S3MockLogStore with conditional-PUT semantics.
 */
public class S3MockFileSystem extends RawLocalFileSystem {
  private URI uri = URI.create("s3mock:///");

  @Override
  public void initialize(URI name, Configuration conf) throws IOException {
    String auth = name.getAuthority() == null ? "" : name.getAuthority();
    this.uri = URI.create(name.getScheme() + "://" + auth + "/");
    super.initialize(name, conf);
  }

  @Override
  public URI getUri() {
    // the superclass constructor calls getUri() before this class's
    // field initializers run - fall back to the bare scheme then
    return uri == null ? URI.create("s3mock:///") : uri;
  }

  @Override
  public String getScheme() {
    return "s3mock";
  }
}
